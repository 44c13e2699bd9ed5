"""Same-process on-chip A/B: s_tile=128 vs 256 at the flagship basis —
a fresh same-session anchor for the :func:`choose_s_tile` cost model
(r2-cont measured 128 > 256 by ~2% in an alternating sweep; the model
predicts the same ordering: 256 doubles UP -> +103% membership-matmul
work at equal VPU pairs).  NOTE: s_tile=64 was tried first and FAILS
Mosaic lowering (last block dim must be a multiple of 128) — that
finding is baked into choose_s_tile's candidate set.

Labels are bit-identical across tilings (site_order differs, but labels
index center ROWS); the checksum asserts it.

Run (exclusive TPU session, in background):
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      tools/ab_s_tile.py
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
    cell_diag = jnp.asarray(np.diag(cell).astype(np.float32))

    def make_step(s_tile):
        basis = prepare_mxu_basis(
            verts, np.ones_like(verts, bool), (grid + 0.5) * bench.A_LAT,
            cell, s_tile=s_tile, static_ref=grid * bench.A_LAT,
            midpoint=bench.MIDPOINT, steepness=bench.STEEPNESS,
            cutoff_shape=bench.CUTOFF)
        assert basis["preshift"], s_tile
        centers_mxu = jnp.asarray(permute_centers(centers, basis))
        bd = dict(basis, cost_ratio=0.0, site_order=None)

        @jax.jit
        def step(sb, mb):
            def body(carry, xs):
                static, mobile = xs
                labels, _ = mxu_assign_blocks(
                    mobile, static, bd, cell_diag, centers_mxu,
                    midpoint=bench.MIDPOINT, steepness=bench.STEEPNESS,
                    threshold=bench.ASSIGN_THR, cutoff_shape=bench.CUTOFF)
                stats = _jump_stats_parallel(labels, bench.K_CENTERS)
                return carry + stats["n_ij"].sum() + labels.sum(), None

            total, _ = jax.lax.scan(body, jnp.int32(0), (sb, mb))
            return total
        print(f"s_tile={s_tile}: n_st={basis['n_st']} UP={basis['UP']}",
              flush=True)
        return step

    static, mobile = frames(bench.N_BLOCKS * bench.BLOCK, seed2=7)
    sb = jnp.asarray(static.reshape(bench.N_BLOCKS, bench.BLOCK,
                                    n_static, 3))
    mb = jnp.asarray(mobile.reshape(bench.N_BLOCKS, bench.BLOCK,
                                    bench.N_IONS, 3))

    steps = {128: make_step(128), 256: make_step(256)}
    sums = {}
    for st, step in steps.items():
        t0 = time.perf_counter()
        sums[st] = int(np.asarray(step(sb, mb)))
        print(f"compile+warm s_tile={st}: {time.perf_counter() - t0:.1f}s "
              f"checksum {sums[st]}", flush=True)
    assert sums[128] == sums[256], sums

    reps = {k: [] for k in steps}
    nf = bench.N_BLOCKS * bench.BLOCK
    for i in range(6):
        for st, step in steps.items():
            t0 = time.perf_counter()
            np.asarray(step(sb, mb))
            fps = nf / (time.perf_counter() - t0)
            reps[st].append(fps)
            print(f"rep {i} s_tile={st}: {fps:.1f} fps", flush=True)

    out = {f"s_tile_{k}": dict(median=round(float(np.median(v)), 1),
                               spread=[round(min(v), 1), round(max(v), 1)])
           for k, v in reps.items()}
    out["ratio_256_over_128"] = round(out["s_tile_256"]["median"]
                                      / out["s_tile_128"]["median"], 4)
    out["checksums_equal"] = True
    out["probe_s"] = round(probe, 1)
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # teardown hygiene
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
