"""Benchmark driver: prints one JSON line with the headline metric.

Metric: LM iterations/sec on the real-world 177-scan benchmark's factor
problem (full Hessian+gradient evaluation + solve + trial residual per
iteration).  Baseline: the REFERENCE BALM2 solver itself, compiled and
measured on THIS machine via tests/parity/ (artifacts/
parity_realworld.json, quiet-machine round-3 rerun): 4 LM iterations in
5.97 s with 4 threads on the same 5529-plane problem -> 0.67 iter/s.

Also reports achieved FLOP/s on the Hessian assembly (the dominant
compute), an MFU estimate against the chip's bf16 peak, and
`end_to_end_s` = association (native host engine) + solve — the full
pipeline a user runs, comparable to the reference binary's total.

TIMING PROTOCOL: through the axon tunnel `jax.block_until_ready` does
NOT block (it acknowledges enqueue; verified by fetch-after-block taking
the full compute time — utils/sync.py).  Rounds 1-2 timed with
block_until_ready and were therefore measuring dispatch latency (~14x
optimistic).  This version uses the slope protocol from utils/sync:
per_run = (t[k chained runs + fetch] - t[1 run + fetch]) / (k-1), with
data-dependent chaining so runs cannot overlap or be elided.
"""

import json
import os
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 0.67
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")

# matmul peak (bf16) by device kind; f32 runs as multi-pass so MFU vs the
# bf16 number is the honest "fraction of the chip" figure
_PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e
}


def _tpu_alive(attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3")),
               timeout=int(os.environ.get("BENCH_PROBE_TIMEOUT", "200"))):
    """Probe the (tunneled) TPU in a subprocess — device init can hang for
    minutes when the shared tunnel is contended, and indefinitely when it
    is down.  Retry a few times before falling back to CPU."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 8));"
        "print(float((x @ x).sum()))"
    )
    for k in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, timeout=timeout,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if k + 1 < attempts:
            time.sleep(10.0)
    return False


def main():
    if os.environ.get("BENCH_FORCE_TPU", "0") == "1":
        pass  # trust the caller; init may block until the tunnel frees
    elif not _tpu_alive():
        # tunnel down: fall back to CPU so the benchmark always reports
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.pipelines import realworld
    from balm_tpu.solver import lm
    from balm_tpu.voxel import grid

    on_tpu = jax.default_backend() == "tpu"
    backend = os.environ.get("BENCH_BACKEND",
                             "pallas" if on_tpu else "xla")
    # packed evaluator implementation: 'xla' (default — fastest end-to-end
    # through the tunnel) or 'pallas2' (fused kernel, faster device-side;
    # see solver/lm.py damping_iter docstring)
    packed_impl = os.environ.get("BENCH_PACKED_IMPL", "auto")

    from balm_tpu.utils import sync

    dtype = "float32"
    cfg = realworld.RealworldConfig(dtype=dtype, centered=True)
    R, p, scans = realworld.load(cfg)

    # host association (native C++ engine) — the CPU-fallback production
    # path and the comparison point for the on-device voxelizer.
    # best-of-2: the first association pays ~1 GB of fresh page faults
    # (measured 2-10 s variance; see artifacts/parity_realworld.json
    # assoc_runs_s) — steady-state is the comparable number
    t_assoc_host = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
        t_assoc_host = min(t_assoc_host, time.perf_counter() - t0)

    from balm_tpu.utils import sync as _sync

    t_assoc = t_assoc_host
    assoc_backend = "native_host"
    planes_device = None
    if on_tpu:
        # PRODUCTION TPU association: on-chip voxelizer (voxel/device.py)
        # — scans live in HBM (one-time transfer, excluded like the PCD
        # load), association is a single jitted program slope-timed like
        # the solve.  Capacities tuned for realworld (1.3x headroom;
        # voxelize_device discovers them via retry elsewhere).
        from balm_tpu.voxel import device as vdev

        scans32 = [s.astype(np.float32) for s in scans]
        body, mask = vdev.pad_scans(scans32, np.float32)
        bd = jax.device_put(body)
        md = jax.device_put(mask)
        R32 = jax.device_put(R.astype(np.float32))
        p32 = jax.device_put(p.astype(np.float32))
        float(bd[-1, -1, 0])    # finish the transfer

        kw = dict(
            voxel_size=float(cfg.voxel.voxel_size),
            layer_limit=int(cfg.voxel.layer_limit),
            eigen_ratio=tuple(float(r) for r in cfg.voxel.eigen_ratio),
            min_points=int(cfg.voxel.min_points),
            min_observers=int(cfg.voxel.min_observers),
            unit_coe=False,
            cell_caps=(1 << 14, 1 << 16, 1 << 17),
            Gcap=1 << 13, cs_cap=2_200_000, pair_cap=1 << 18,
            want_point_leaf=False)

        def assoc(b):
            return vdev._voxelize_core(b, md, R32, p32, **kw)

        dres = assoc(bd)
        planes_device = int(dres.num_planes)   # compile + fetch (sync)
        if bool(dres.overflow):
            raise RuntimeError("device voxelizer capacity overflow")
        st = _sync.time_per_run(assoc, bd, k=4, reps=2, warmup=False)
        t_assoc = st["per_run_s"]
        assoc_backend = "device"
        f = dres.factors
        G = planes_device
    if not on_tpu or planes_device is None:
        f = Fmod.recenter_bodies(vres.factors).astype(jnp.dtype(dtype))
        # recenter_bodies stays numpy on purpose (f64 before the f32
        # cast); the solve inputs must be DEVICE-RESIDENT or every run
        # re-ships the ~62 MB factor tree through the tunnel (~0.6 s/run
        # — this one line was 95% of the round-3 bench time before the
        # fix)
        f = jax.tree_util.tree_map(jnp.asarray, f)
        G = int(vres.num_planes)
    R = jnp.asarray(R, dtype)
    p = jnp.asarray(p, dtype)
    W = int(R.shape[0])

    solver_cfg = SolverConfig(max_iters=10, u_init=0.01, rel_tol=0.0)

    def run(Rin):
        return lm.damping_iter(
            Rin, p, f, solver_cfg, centered=True, backend=backend,
            packed_impl=packed_impl)

    res = run(R)
    sync.fetch_scalar(res.residual)  # compile + first real execution

    # slope-timed batches; tunnel contention shows up to 15x variance so
    # take the global best across spaced batches
    batches = int(os.environ.get("BENCH_BATCHES", "3"))
    kchain = int(os.environ.get("BENCH_CHAIN", "5"))
    stats = []
    for b in range(batches):
        stats.append(sync.time_per_run(run, R, k=kchain, reps=2,
                                       warmup=False))
        if b + 1 < batches:
            if stats[-1]["per_run_s"] < 0.2:
                break  # quiet window already captured
            time.sleep(float(os.environ.get("BENCH_BATCH_SLEEP", "45")))
    dt = min(s["per_run_s"] for s in stats)

    # per-dispatch+fetch floor (the tunnel round-trip a co-located chip
    # would not pay): slope-timed like the workload
    noop = jax.jit(lambda x: x + 1.0)
    floor = sync.time_per_run(noop, jnp.zeros(()), k=kchain, reps=2)
    dispatch_floor = floor["t1_s"]
    res = run(R)

    assert float(res.trace_res1[0]) > 0, "residual must be positive"
    iters = max(int(res.iters), 1)
    ips = iters / dt
    # full-pipeline wall: association (host engine) + one solve run
    end_to_end_s = t_assoc + dt

    # accepted iterations recompute the Hessian; rejected ones only the
    # trial residual.  FLOP model: Hessian rank-row matmul (dominant)
    # + trial-residual moment pass, per accepted iteration.
    n_acc = int(np.nansum(np.array(res.trace_accept, np.float64)))
    n_acc = max(n_acc, 1)
    flops_hess = 2.0 * (6 * W) ** 2 * (3 * G)
    flops_total = n_acc * flops_hess
    tflops = flops_total / dt / 1e12

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak = next((v for k2, v in _PEAK_TFLOPS.items() if k2 in str(kind)),
                None)
    mfu = (tflops / peak) if peak else None

    # The W=177 reference problem is DISPATCH-FLOOR-BOUND on this chip
    # (total_s ~ dispatch_floor_s) so its MFU is a latency statement,
    # not a kernel-efficiency one.  Measure the big-kernel MFU at
    # W=1024 separately (round-4 verdict item 4: emit both).
    kernel_w1024 = None
    if on_tpu and os.environ.get("BENCH_LARGE_MFU", "1") == "1":
        try:
            from jax import lax as _lax

            from balm_tpu.ops import packed as _pkmod
            from balm_tpu.ops import pallas_evaluate as _pe

            rngk = np.random.default_rng(0)
            Wk, Gk = 1024, 16384
            Ck = np.zeros((Gk, Wk, 4, 4), np.float64)
            nk = rngk.integers(20, 200, size=(Gk, Wk)).astype(np.float64)
            Ak = rngk.normal(size=(Gk, Wk, 3, 3)) * 0.05
            Ck[..., :3, :3] = np.einsum(
                "gwab,gwcb->gwac", Ak, Ak) * nk[..., None, None]
            Ck[..., 3, 3] = nk
            fk = Fmod.PlaneFactors.create(jnp.asarray(Ck, jnp.float32))
            fk = fk._replace(centers=jnp.asarray(
                rngk.normal(size=(Gk, 3)) * 30, jnp.float32))
            pkk = jax.device_put(_pkmod.pack_factors(fk))
            Rk = jnp.asarray(np.stack([np.eye(3)] * Wk), jnp.float32)
            pk_ = jnp.asarray(rngk.normal(size=(Wk, 3)), jnp.float32)

            evf = jax.jit(lambda R_, p_, pkt: _pe.evaluate_packed_jw(
                R_, p_, pkt, hess_precision=_lax.Precision.HIGH))
            sync.fetch_scalar(evf(Rk, pk_, pkk)[0])    # compile + warm
            tk = sync.time_per_run(
                lambda R_: evf(R_, pk_, pkk), Rk, k=5, reps=2,
                warmup=False)
            fl = 2.0 * (6 * pkk.wp) ** 2 * (3 * pkk.gp)
            tf = fl / tk["per_run_s"] / 1e12
            kernel_w1024 = {
                "evaluate_s": round(tk["per_run_s"], 4),
                "tflops": round(tf, 1),
                "mfu_vs_bf16_peak": (round(tf / peak, 4) if peak
                                     else None),
                "mfu_vs_f32_3pass_peak": (round(tf / (peak / 3.0), 4)
                                          if peak else None),
                "backend": "hybrid_jw",
            }
        except Exception as e:                       # noqa: BLE001
            kernel_w1024 = {"error": str(e)[:200]}

    print(
        json.dumps(
            {
                "metric": "lm_iterations_per_sec_realworld177",
                "value": round(ips, 3),
                "unit": "iter/s",
                "vs_baseline": round(ips / BASELINE_ITERS_PER_SEC, 3),
                "detail": {
                    "scans": W,
                    "planes": G,
                    "iters": iters,
                    "accepted": n_acc,
                    "total_s": round(dt, 4),
                    "assoc_s": round(t_assoc, 3),
                    "assoc_backend": assoc_backend,
                    "assoc_host_native_s": round(t_assoc_host, 3),
                    "planes_device": planes_device,
                    "planes_host": int(vres.num_planes),
                    "end_to_end_s": round(end_to_end_s, 3),
                    "batch_stats": [
                        {k2: round(v, 4) for k2, v in s.items()}
                        for s in stats
                    ],
                    "timing_protocol": "slope(k-chain + fetch); "
                                       "block_until_ready does not block "
                                       "through the tunnel (utils/sync.py)",
                    "residual_initial": float(res.trace_res1[0]),
                    "residual_final": float(res.residual),
                    "dtype": dtype,
                    "backend": backend,
                    "device": str(dev),
                    "hessian_tflops": round(tflops, 3),
                    "mfu_vs_bf16_peak": (round(mfu, 4)
                                         if mfu is not None else None),
                    "mfu_note": "W=177 is dispatch-floor-bound "
                                "(total_s ~ dispatch_floor_s); see "
                                "kernel_w1024 for kernel efficiency",
                    "kernel_w1024": kernel_w1024,
                    "dispatch_floor_s": round(dispatch_floor, 4),
                    "chained_dispatch_floor_s": round(
                        floor["per_run_s"], 4),
                    "hessian_tflops_net": round(
                        flops_total
                        / max(dt - floor["per_run_s"], 1e-9) / 1e12,
                        3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
