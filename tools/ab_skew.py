"""Same-process alternating A/B: plain vs software-pipelined (skew) MXU
kernel at the bench config (PERFORMANCE.md 'Latency budget').

The budget says the plain kernel's per-tile chain (VPU distance core →
membership matmul → exp → similarity matmul) runs at 4.1 µs/tile against
a 3.3 µs serial ideal and a 2.0 µs perfect-overlap bound — so up to ~40%
is on the table IF Mosaic can overlap the VPU work of tile st with the
big MXU matmul of tile st-1.  The skew kernel restructures exactly that
(bit-identical labels, tested in tests/test_landmark_mxu.py); this
script measures whether the overlap materializes on real hardware.

Usage: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
           tools/ab_skew.py [--reps 6]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (A_LAT, CUTOFF, MIDPOINT, N_CELLS, N_IONS,  # noqa: E402
                   STEEPNESS, ASSIGN_THR, build_system)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6,
                    help="alternating timed segments per variant")
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sitator_tpu.ops.landmark_mxu import (mxu_assign_blocks,
                                              permute_centers,
                                              prepare_mxu_basis)

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    t0 = time.perf_counter()
    np.asarray(jnp.ones((256, 256)) @ jnp.ones((256, 256)))
    print(f"# health matmul: {time.perf_counter() - t0:.2f}s", flush=True)

    cell, verts, frames, centers, n_static = build_system()
    grid = np.stack(np.meshgrid(*[np.arange(N_CELLS)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    site_pos = (grid + 0.5) * A_LAT
    basis = prepare_mxu_basis(verts, np.ones_like(verts, bool), site_pos,
                              cell, s_tile=128, static_ref=grid * A_LAT,
                              midpoint=MIDPOINT, steepness=STEEPNESS,
                              cutoff_shape=CUTOFF)
    centers_mxu = jnp.asarray(permute_centers(centers, basis))
    cell_diag = jnp.asarray(np.diag(cell).astype(np.float32))
    NB, B = args.blocks, args.frames
    static, mobile = frames(NB * B, seed2=7)
    sb = jnp.asarray(static.reshape(NB, B, n_static, 3))
    mb = jnp.asarray(mobile.reshape(NB, B, N_IONS, 3))
    # ref_u/anchors are only present when the preshift bound accepted
    # (prepare_mxu_basis omits them otherwise) — mirror the engine's
    # conditional access so a bound-rejecting config still measures
    bd = dict(uidx=basis["uidx"], A=basis["A"], kill=basis["kill"],
              s_tile=basis["s_tile"], n_st=basis["n_st"], UP=basis["UP"],
              cost_ratio=0.0, site_order=None, preshift=basis["preshift"],
              ref_u=basis.get("ref_u"), anchors=basis.get("anchors"))

    def make_step(skew):
        @jax.jit
        def step(sb, mb, centers_j):
            def body(carry, xs):
                st, mo = xs
                labels, confs = mxu_assign_blocks(
                    mo, st, bd, cell_diag, centers_j,
                    midpoint=MIDPOINT, steepness=STEEPNESS,
                    threshold=ASSIGN_THR, cutoff_shape=CUTOFF, skew=skew)
                return carry + labels.sum() + (confs * 1000).astype(
                    jnp.int32).sum(), None
            total, _ = jax.lax.scan(body, jnp.int32(0), (sb, mb))
            return total
        return step

    step_plain = make_step(False)
    step_skew = make_step(True)

    @jax.jit
    def compare(sb, mb, centers_j):
        # exact on-device equality over every block: label mismatches +
        # bitwise conf mismatches (a scalar checksum can mask sub-1e-3
        # conf drift or compensating label changes; this cannot)
        def body(c, xs):
            st, mo = xs
            kw = dict(midpoint=MIDPOINT, steepness=STEEPNESS,
                      threshold=ASSIGN_THR, cutoff_shape=CUTOFF)
            la, ca = mxu_assign_blocks(mo, st, bd, cell_diag, centers_j,
                                       skew=False, **kw)
            lb, cb = mxu_assign_blocks(mo, st, bd, cell_diag, centers_j,
                                       skew=True, **kw)
            bits = jax.lax.bitcast_convert_type
            mism = ((la != lb).sum()
                    + (bits(ca, jnp.int32) != bits(cb, jnp.int32)).sum())
            return c + mism, None
        tot, _ = jax.lax.scan(body, jnp.int32(0), (sb, mb))
        return tot

    # warm BOTH variants before any timed segment (compile poisoning)
    t0 = time.perf_counter()
    np.asarray(step_plain(sb, mb, centers_mxu))
    print(f"# plain compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    np.asarray(step_skew(sb, mb, centers_mxu))
    print(f"# skew  compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    mismatches = int(np.asarray(compare(sb, mb, centers_mxu)))
    assert mismatches == 0, f"{mismatches} label/conf bit mismatches"
    print("# bitwise equal on device: labels + confs", flush=True)

    segs = []
    for i in range(args.reps):
        for tag, step in (("plain", step_plain), ("skew", step_skew)):
            t0 = time.perf_counter()
            np.asarray(step(sb, mb, centers_mxu))
            segs.append((tag, NB * B / (time.perf_counter() - t0)))
    med = {tag: float(np.median([v for t, v in segs if t == tag]))
           for tag in ("plain", "skew")}
    out = {
        "metric": "mxu_kernel_skew_ab",
        "segments": [(t, round(v, 1)) for t, v in segs],
        "plain_fps": round(med["plain"], 1),
        "skew_fps": round(med["skew"], 1),
        "ratio": round(med["skew"] / med["plain"], 4),
        "bitwise_equal": True,
        "device": dev.device_kind,
    }
    print(json.dumps(out), flush=True)
    with open("/tmp/ab_skew_result.json", "w") as f:
        json.dump(out, f)
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # teardown drain
    time.sleep(2)


if __name__ == "__main__":
    main()
