"""Same-process on-chip A/B: f32- vs bf16-stored centers in the MXU
kernel (PERFORMANCE.md 'Roofline' round-4 lever — the similarity matmul
consumes centers as bf16 anyway; storing them bf16 halves the kernel's
dominant HBM stream, 38.3 -> 19.2 MB/frame at the bench basis).

Methodology (CLAUDE.md): compare variants within ONE process (chip
throughput varies ~2x across sessions), health-probe first, alternate
timed reps A/B/A/B, and assert the result checksums match exactly (the
change is provably bit-identical — the cast merely moves earlier).

Run (exclusive TPU session, in background):
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      tools/ab_centers_bf16.py
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from sitator_tpu.ops.jumps import _jump_stats_parallel
    from sitator_tpu.ops.landmark_mxu import (
        mxu_assign_blocks,
        permute_centers,
        prepare_mxu_basis,
    )

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    np.asarray(x @ x)
    probe = time.perf_counter() - t0
    print(f"health probe: {probe:.1f}s on {jax.devices()[0].device_kind}",
          flush=True)

    cell, verts, frames, centers, n_static = bench.build_system()
    grid = np.stack(np.meshgrid(*[np.arange(bench.N_CELLS)] * 3,
                                indexing="ij"), axis=-1).reshape(-1, 3)
    basis = prepare_mxu_basis(verts, np.ones_like(verts, bool),
                              (grid + 0.5) * bench.A_LAT, cell, s_tile=128,
                              static_ref=grid * bench.A_LAT,
                              midpoint=bench.MIDPOINT,
                              steepness=bench.STEEPNESS,
                              cutoff_shape=bench.CUTOFF)
    assert basis["preshift"]
    cell_diag = jnp.asarray(np.diag(cell).astype(np.float32))
    centers_mxu = jnp.asarray(permute_centers(centers, basis))
    bd = dict(uidx=basis["uidx"], A=basis["A"], kill=basis["kill"],
              s_tile=basis["s_tile"], n_st=basis["n_st"], UP=basis["UP"],
              cost_ratio=0.0, site_order=None, preshift=True,
              ref_u=basis["ref_u"], anchors=basis["anchors"])

    def make_step(store_f32):
        @jax.jit
        def step(sb, mb, centers_j, uidx, Am, kill, ref_u, anchors):
            b = dict(bd, uidx=uidx, A=Am, kill=kill, ref_u=ref_u,
                     anchors=anchors)

            def body(carry, xs):
                static, mobile = xs
                labels, _ = mxu_assign_blocks(
                    mobile, static, b, cell_diag, centers_j,
                    midpoint=bench.MIDPOINT, steepness=bench.STEEPNESS,
                    threshold=bench.ASSIGN_THR, cutoff_shape=bench.CUTOFF,
                    centers_store_f32=store_f32)
                stats = _jump_stats_parallel(labels, bench.K_CENTERS)
                return carry + stats["n_ij"].sum() + labels.sum(), None

            total, _ = jax.lax.scan(body, jnp.int32(0), (sb, mb))
            return total
        return step

    static, mobile = frames(bench.N_BLOCKS * bench.BLOCK, seed2=7)
    sb = jnp.asarray(static.reshape(bench.N_BLOCKS, bench.BLOCK,
                                    n_static, 3))
    mb = jnp.asarray(mobile.reshape(bench.N_BLOCKS, bench.BLOCK,
                                    bench.N_IONS, 3))
    args = (sb, mb, centers_mxu, basis["uidx"], basis["A"], basis["kill"],
            basis["ref_u"], basis["anchors"])

    steps = {"f32_centers": make_step(True),
             "bf16_centers": make_step(False)}
    sums = {}
    for name, step in steps.items():
        t0 = time.perf_counter()
        sums[name] = int(np.asarray(step(*args)))
        print(f"compile+warm {name}: {time.perf_counter() - t0:.1f}s "
              f"checksum {sums[name]}", flush=True)
    assert sums["f32_centers"] == sums["bf16_centers"], sums

    reps = {k: [] for k in steps}
    nf = bench.N_BLOCKS * bench.BLOCK
    for i in range(6):
        for name, step in steps.items():
            t0 = time.perf_counter()
            np.asarray(step(*args))
            fps = nf / (time.perf_counter() - t0)
            reps[name].append(fps)
            print(f"rep {i} {name}: {fps:.1f} fps", flush=True)

    out = {k: dict(median=round(float(np.median(v)), 1),
                   spread=[round(min(v), 1), round(max(v), 1)])
           for k, v in reps.items()}
    out["speedup_bf16"] = round(out["bf16_centers"]["median"]
                                / out["f32_centers"]["median"], 4)
    out["checksums_equal"] = True
    out["probe_s"] = round(probe, 1)
    # teardown hygiene: drop the big pools and sync a tiny op so the next
    # session does not inherit a wedged chip
    del args, sb, mb
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
