"""Benchmark: landmark + assignment + jump detection throughput (frames/sec)
on the BASELINE.md headline config scale — 10k atoms (9261 static SC lattice,
739 mobile ions), a 9261-landmark basis (8 vertices each), 1024 site centers
— on one TPU chip.  The multi-chip path is validated separately
(``__graft_entry__.dryrun_multichip``); throughput scales linearly in the
frame axis by construction (frame-sharded, psum-only communication).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "spread",
"n_reps"} — value is the MEDIAN of n_reps in-process repeats and spread is
[min, max] (chip throughput varies ~2x run-to-run, so a single number is
not a defensible headline).  vs_baseline is measured against a vectorized-
NumPy implementation of the reference algorithm (sitator's Cython loop is
single-core; vectorized NumPy with multithreaded BLAS is a generous
stand-in) on the same config.
"""
import json
import os
import sys
import time

import numpy as np

N_CELLS = 21          # 21^3 = 9261 static atoms
A_LAT = 4.0
N_IONS = 739          # 9261 + 739 = 10000 atoms
K_CENTERS = 1024
BLOCK = 32            # frames per analysis block
N_BLOCKS = 8          # blocks per timed dispatch (scan-batched)
MIDPOINT, STEEPNESS, ASSIGN_THR = 4.0, 3.0, 0.35
# both sides use the production cutoff (slope-matched logistic in d^2 —
# same smooth-switch physics, no sqrt); comparison is apples-to-apples
CUTOFF = "logistic_r2"


def build_system(seed=0):
    rng = np.random.default_rng(seed)
    grid = np.stack(np.meshgrid(*[np.arange(N_CELLS)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3)
    n_static = len(grid)
    host = grid * A_LAT
    cell = np.eye(3, dtype=np.float32) * (N_CELLS * A_LAT)
    # analytic SC cage vertices (what VoronoiSiteGenerator produces, built
    # directly so the bench isolates the hot path)
    lin = (grid[:, 0] * N_CELLS + grid[:, 1]) * N_CELLS + grid[:, 2]
    order = np.argsort(lin)
    assert np.array_equal(order, np.arange(n_static))
    verts = np.zeros((n_static, 8), np.int32)
    k = 0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                gi = (grid[:, 0] + di) % N_CELLS
                gj = (grid[:, 1] + dj) % N_CELLS
                gk = (grid[:, 2] + dk) % N_CELLS
                verts[:, k] = (gi * N_CELLS + gj) * N_CELLS + gk
                k += 1
    sites = (grid + 0.5) * A_LAT
    occ = rng.choice(n_static, size=N_IONS, replace=False)

    def frames(n, seed2):
        r = np.random.default_rng(seed2)
        static = host[None] + r.normal(scale=0.05, size=(n, n_static, 3))
        mobile = sites[occ][None] + r.normal(scale=0.25, size=(n, N_IONS, 3))
        return static.astype(np.float32), mobile.astype(np.float32)

    centers = rng.random((K_CENTERS, n_static)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    return cell, verts, frames, centers, n_static


def kernel_flops_per_frame(basis):
    """Host-side FLOP count of the production MXU kernel at this basis
    (PERFORMANCE.md 'Roofline'): matmuls at 2·M·N·K, the elementwise
    distance+cutoff core at 12 FLOP per (ion, unique-atom) pair
    (3 subs + 3 muls + 2 adds for d², ~4 for the softplus core; exp/log
    counted as 1 — the MFU convention for transcendental-light kernels)."""
    n_st, UP, s_tile = basis["n_st"], basis["UP"], basis["s_tile"]
    MP = -(-N_IONS // 128) * 128
    KP = -(-K_CENTERS // 128) * 128
    SP = n_st * s_tile
    fl_A = 2 * MP * UP * s_tile * n_st          # log-space membership matmul
    fl_sims = 2 * MP * SP * KP                  # similarity matmul (bf16)
    fl_pairs = 12 * MP * UP * n_st              # distance + cutoff core (VPU)
    fl_norm = 2 * MP * SP                       # self-norm accumulation
    return fl_A + fl_sims + fl_pairs + fl_norm


# bf16 matmul peak by device kind (dense, per chip) — substring-matched
_PEAK_BF16 = (("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
              ("v6 lite", 918e12), ("v6e", 918e12), ("v4", 275e12))


def _device_peak_bf16():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def cpu_reference_fps(cell, verts, frames, centers, n_frames=10,
                      site_chunk=256):
    """Reference algorithm, vectorized NumPy (site-chunked so intermediates
    stay cache-resident — a *generous* stand-in for the reference's
    single-core Cython loop): per-site gather of vertex positions, logistic
    cutoff product, normalize, assign by max cosine."""
    static, mobile = frames(n_frames, seed2=123)
    cell_inv = np.linalg.inv(cell).astype(np.float32)
    S = len(verts)
    t0 = time.perf_counter()
    for f in range(n_frames):
        lv = np.empty((len(mobile[f]), S), np.float32)
        for lo in range(0, S, site_chunk):
            vp = static[f][verts[lo:lo + site_chunk]]    # (Sc, 8, 3)
            diff = mobile[f][:, None, None, :] - vp[None]  # (M, Sc, 8, 3)
            df = diff @ cell_inv
            df -= np.round(df)
            d2 = np.sum((df @ cell) ** 2, axis=-1)       # (M, Sc, 8)
            k2 = STEEPNESS / (2.0 * MIDPOINT)
            lv[:, lo:lo + site_chunk] = np.exp(np.sum(
                -np.logaddexp(0.0, k2 * (d2 - MIDPOINT ** 2)), axis=-1))
        lv /= np.maximum(np.linalg.norm(lv, axis=1, keepdims=True), 1e-12)
        sims = lv @ centers.T                        # (M, K)
        lab = sims.argmax(1)
        lab[sims.max(1) < ASSIGN_THR] = -1
    dt = time.perf_counter() - t0
    return n_frames / dt


def tpu_fps(cell, verts, frames, centers, n_static, mode="mxu"):
    """Throughput of the full landmark+assign+jump step on device.

    mode 'mxu' uses the unique-atom MXU-product kernel (the production
    path); 'fused' the per-vertex gather Pallas kernel; 'xla' the dense
    log-matmul formulation.  Timing is scan-batched — one dispatch covers
    N_BLOCKS blocks and returns a scalar, so remote-dispatch latency cannot
    pollute the measurement.
    """
    import jax
    import jax.numpy as jnp
    from sitator_tpu.ops import landmark as lmops
    from sitator_tpu.ops.jumps import _jump_stats_parallel
    from sitator_tpu.ops.landmark_mxu import (
        mxu_assign_blocks,
        permute_centers,
        prepare_mxu_basis,
    )
    from sitator_tpu.ops.landmark_pallas import fused_assign_blocks

    cell_j = jnp.asarray(cell)
    cell_inv = jnp.asarray(np.linalg.inv(cell).astype(np.float32))
    cell_diag = jnp.asarray(np.diag(cell).astype(np.float32))
    vmask = jnp.ones_like(verts, dtype=bool)
    active = jnp.ones(K_CENTERS, bool)

    basis = None
    centers_mxu = None
    if mode == "mxu":
        grid = np.stack(np.meshgrid(*[np.arange(N_CELLS)] * 3,
                                    indexing="ij"), axis=-1).reshape(-1, 3)
        site_pos = (grid + 0.5) * A_LAT
        # use whatever the co-tuner picks at this basis (what the engines
        # run); the headline has historically measured s_tile=128 — a
        # drift is logged loudly and recorded in the JSON, never a crash
        from sitator_tpu.ops.landmark_mxu import choose_s_tile
        s_tile = choose_s_tile(verts, np.ones_like(verts, bool), site_pos,
                               cell)
        if s_tile != 128:
            print(f"bench: choose_s_tile picked {s_tile} (headline "
                  "historically measured at 128) — cost model drifted",
                  file=sys.stderr, flush=True)
        basis = prepare_mxu_basis(verts, np.ones_like(verts, bool),
                                  site_pos, cell, s_tile=s_tile,
                                  static_ref=grid * A_LAT,
                                  midpoint=MIDPOINT, steepness=STEEPNESS,
                                  cutoff_shape=CUTOFF)
        centers_mxu = jnp.asarray(permute_centers(centers, basis))

    @jax.jit
    def step(static_blocks, mobile_blocks, verts_j, centers_j, A,
             uidx, Am, kill, ref_u, anchors):
        # big arrays arrive as arguments (baking them into the HLO as
        # constants bloats the program past the remote-compile limit)
        def body(carry, xs):
            static, mobile = xs
            if mode == "mxu":
                labels, confs = mxu_assign_blocks(
                    mobile, static,
                    dict(uidx=uidx, A=Am, kill=kill,
                         s_tile=basis["s_tile"], n_st=basis["n_st"],
                         UP=basis["UP"], cost_ratio=0.0, site_order=None,
                         preshift=basis["preshift"], ref_u=ref_u,
                         anchors=anchors),
                    cell_diag, centers_j,
                    midpoint=MIDPOINT, steepness=STEEPNESS,
                    threshold=ASSIGN_THR, cutoff_shape=CUTOFF)
            elif mode == "fused":
                labels, confs = fused_assign_blocks(
                    mobile, static, verts_j, vmask, cell_diag, centers_j,
                    midpoint=MIDPOINT, steepness=STEEPNESS,
                    threshold=ASSIGN_THR, s_tile=256, mxu_bf16=True,
                    cutoff_shape=CUTOFF, full_mask=True)
            else:
                lv = lmops.landmark_vectors(
                    mobile, static, A, cell_j, cell_inv, MIDPOINT, STEEPNESS,
                    matmul_dtype=jnp.bfloat16)
                lv_n, _ = lmops.normalize_landmark_vectors(lv)
                labels, confs = lmops.assign_to_centers(
                    lv_n, centers_j, active, ASSIGN_THR,
                    matmul_dtype=jnp.bfloat16)
            stats = _jump_stats_parallel(labels, K_CENTERS)
            return carry + stats["n_ij"].sum() + labels.sum(), None

        total, _ = jax.lax.scan(body, jnp.int32(0),
                                (static_blocks, mobile_blocks))
        return total

    if mode == "xla":
        A = lmops.vertex_membership_matrix(verts, np.ones_like(verts, bool),
                                           n_static)
    else:
        A = jnp.zeros((1, 1), jnp.float32)  # unused
    static, mobile = frames(N_BLOCKS * BLOCK, seed2=7)
    sb = jnp.asarray(static.reshape(N_BLOCKS, BLOCK, n_static, 3))
    mb = jnp.asarray(mobile.reshape(N_BLOCKS, BLOCK, N_IONS, 3))
    centers_arg = centers_mxu if mode == "mxu" else jnp.asarray(centers)
    if basis is not None:
        ps = basis["preshift"]
        bargs = (basis["uidx"], basis["A"], basis["kill"],
                 basis["ref_u"] if ps else jnp.zeros(
                     (basis["n_st"], basis["UP"], 3), jnp.float32),
                 basis["anchors"] if ps else jnp.zeros(
                     (basis["n_st"], 3), jnp.float32))
    else:
        bargs = (jnp.zeros((1, 1), jnp.int32),
                 jnp.zeros((1, 1, 1), jnp.float32),
                 jnp.zeros((1, 1), jnp.float32),
                 jnp.zeros((1, 1, 3), jnp.float32),
                 jnp.zeros((1, 3), jnp.float32))
    args = (sb, mb, jnp.asarray(verts), centers_arg, A) + bargs

    np.asarray(step(*args))                    # compile + warm (full sync)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(step(*args))                # scalar transfer == sync
        reps.append(N_BLOCKS * BLOCK / (time.perf_counter() - t0))
    return reps, basis


_PROBE_S = None   # wall seconds of the health probe (None on forced CPU)


def _probe_work():
    """One tiny device round-trip.  Returns the backend name; raises on
    any outage (FAILED_PRECONDITION / UNAVAILABLE / init failure).  This
    is the seam tests monkeypatch to simulate outage states."""
    import jax
    import jax.numpy as jnp
    backend = jax.default_backend()      # may itself hang/raise mid-outage
    x = jnp.full((8, 8), 1.0, jnp.float32)
    y = np.asarray(x @ x)                # host transfer == real sync
    if float(y[0, 0]) != 8.0:
        raise RuntimeError(f"probe matmul returned {y[0, 0]!r}")
    return backend


def _probe_device(timeout_s):
    """Run the probe in a daemon thread so a HUNG backend (the r4 outage
    mode: init blocks 15-25 min before raising UNAVAILABLE) is bounded.
    Returns {'ok': bool, 'backend': str|None, 'err': str|None}.  A timed-
    out thread cannot be reaped — callers recover by os.execve, which
    replaces the whole process image, hung thread included."""
    import threading
    out = {}

    def work():
        try:
            out["backend"] = _probe_work()
            out["ok"] = True
        except BaseException as e:      # jaxlib errors may not be Exception
            out["ok"] = False
            out["err"] = repr(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(timeout_s)
    if "ok" not in out:
        return {"ok": False, "backend": None,
                "err": f"probe timed out after {timeout_s:.0f} s"}
    out.setdefault("backend", None)
    out.setdefault("err", None)
    return out


def _reexec(extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _ensure_tpu_backend():
    """The axon tunnel can be down for minutes to hours, in two modes:
    (a) the plugin never registers and JAX silently falls back to CPU;
    (b) the backend REGISTERS (name 'tpu') but every device op raises
    FAILED_PRECONDITION or hangs — the mode that crashed BENCH_r04.
    A name check catches only (a); this guard runs an actual bounded
    device round-trip, re-execs a bounded number of times (fresh backend
    init each try), and terminally re-execs with a sentinel that pins
    CPU in-process (``jax.config.update`` — the env var alone is
    re-pinned by sitecustomize) so the self-describing degraded JSON
    ALWAYS prints."""
    if os.environ.get("SITATOR_BENCH_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
        print("bench: forced-CPU degraded run — TPU outage persisted "
              "through retries (NOT a chip number)", file=sys.stderr,
              flush=True)
        return jax.default_backend()
    # a merely-WEDGED chip (not a dead tunnel) probes in 10-20 min
    # (observed 671 s / 1239 s live); the probe budget must exceed that
    # or the guard converts a recoverable wedge into a degraded record
    timeout_s = float(os.environ.get("SITATOR_BENCH_PROBE_TIMEOUT", "1500"))
    t0 = time.perf_counter()
    res = _probe_device(timeout_s)
    # session-health context for the JSON record: a healthy session
    # probes in seconds, a wedged one in minutes — a weak fps value
    # should carry its own explanation
    global _PROBE_S
    _PROBE_S = round(time.perf_counter() - t0, 1)
    backend = res["backend"]
    if res["ok"] and backend is not None and (
            backend == "axon" or "tpu" in backend.lower()):
        return backend
    why = (res["err"] if not res["ok"]
           else f"backend is {backend!r}, not the TPU")
    tries = int(os.environ.get("SITATOR_BENCH_TPU_RETRY", "0"))
    if tries < 2:
        print(f"bench: TPU unusable ({why}) — retry {tries + 1}/2 "
              "in 180 s", file=sys.stderr, flush=True)
        time.sleep(180)
        _reexec({"SITATOR_BENCH_TPU_RETRY": str(tries + 1)})
    print(f"bench: TPU unusable after retries ({why}) — re-exec pinned "
          "to CPU for the degraded record", file=sys.stderr, flush=True)
    _reexec({"SITATOR_BENCH_FORCE_CPU": "1"})


def main():
    global N_BLOCKS, BLOCK
    backend = _ensure_tpu_backend()
    mode = "mxu"
    if backend == "cpu":
        # tunnel-down fallback must still COMPLETE and record: the
        # Pallas kernel does not lower on CPU (interpret mode is a
        # test-only path, minutes at this scale) — use the dense XLA
        # formulation on a shrunken workload instead
        mode = "xla"
        N_BLOCKS, BLOCK = 1, 4
        print("bench: degraded CPU run — dense XLA path, "
              f"{N_BLOCKS * BLOCK} frames", file=sys.stderr, flush=True)
    cell, verts, frames, centers, n_static = build_system()
    # the axon tunnel occasionally fails transiently (session-grant races);
    # one retry after a cooldown, then a terminal forced-CPU re-exec so a
    # mid-measurement outage still produces the degraded JSON, never a crash
    try:
        reps, basis = tpu_fps(cell, verts, frames, centers, n_static,
                              mode=mode)
    except RuntimeError:
        time.sleep(120)
        try:
            reps, basis = tpu_fps(cell, verts, frames, centers, n_static,
                                  mode=mode)
        except RuntimeError as e:
            if backend == "cpu":
                raise               # already degraded; a CPU crash is real
            print(f"bench: device measurement failed twice ({e!r}) — "
                  "re-exec pinned to CPU for the degraded record",
                  file=sys.stderr, flush=True)
            _reexec({"SITATOR_BENCH_FORCE_CPU": "1"})
    fps = float(np.median(reps))
    ref = cpu_reference_fps(cell, verts, frames, centers, n_frames=10)
    # roofline fields (PERFORMANCE.md 'Roofline'): model FLOPs counted
    # host-side from the basis shapes; peak from the device kind
    flops = kernel_flops_per_frame(basis) if basis is not None else None
    peak = _device_peak_bf16()
    print(json.dumps({
        "metric": "frames_per_sec_landmark_assign_jump_10k_atoms_1chip",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / ref, 1),
        "spread": [round(min(reps), 2), round(max(reps), 2)],
        "n_reps": len(reps),
        "gflop_per_frame": (round(flops / 1e9, 2)
                            if flops is not None else None),
        "tflops": (round(fps * flops / 1e12, 1)
                   if flops is not None else None),
        "mfu": (round(fps * flops / peak, 3)
                if flops is not None and peak is not None else None),
        "backend": backend,
        "mode": mode,
        "s_tile": basis["s_tile"] if basis is not None else None,
        "probe_s": _PROBE_S,
    }))


if __name__ == "__main__":
    main()
