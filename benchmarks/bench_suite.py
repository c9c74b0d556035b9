"""Extended benchmark suite: the five BASELINE.json configurations.

Each benchmark prints one JSON line {name, value, unit, detail}.  Run on the
default backend (TPU under axon; CPU with JAX_PLATFORMS=cpu).  The driver's
headline number stays in the repo-root bench.py (config #3).

Usage: python benchmarks/bench_suite.py [name ...]
Names: svd_pair, pt2pl_pair, batch256, large_cloud, odometry
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pair(dtype=np.float32):
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data")
    return (np.load(os.path.join(base, "points_scan.npy")).astype(dtype),
            np.load(os.path.join(base, "points_map.npy")).astype(dtype))


def _time(fn, n=10, reps=3):
    """Best-of-`reps` mean over `n` dispatches (damps axon tunnel jitter).

    ``fn`` receives a distinct integer every call and MUST vary its device
    inputs with it: the axon remote-execution layer deduplicates identical
    in-flight dispatches, so timing the same computation repeatedly reports
    fantasy numbers (observed: a 61 ms kernel "measured" at 0.3 ms).
    """
    _block(fn(0))  # compile
    best = float("inf")
    k = 1
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n):
            out = fn(k)
            k += 1
        _block(out)
        best = min(best, (time.time() - t0) / n)
    return best


def _shift(x, k):
    """Tiny per-call input perturbation (defeats execution dedup; 1e-7 is
    far below every tolerance/metric in this suite)."""
    import jax.numpy as jnp
    return x + jnp.float32(k) * 1e-7


def _block(out):
    import jax
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)


def _emit(name, value, unit, **detail):
    print(json.dumps({"name": name, "value": round(float(value), 3),
                      "unit": unit, **detail}))


def bench_svd_pair():
    """Config #1: point-to-point SVD ICP on the tests/data pair."""
    import jax.numpy as jnp

    from dicp_tpu import se3
    from dicp_tpu.svd_icp import pt2pt_svd_icp

    scan, mp = _pair()
    src = jnp.asarray(scan[:, :3])
    tgt = jnp.asarray(mp[:, :3])

    def run(k=0):
        return pt2pt_svd_icp(_shift(src, k), tgt, max_iterations=60,
                             tolerance=1e-9, differentiable=False)

    dt = _time(run)
    res = run()
    _block(res)
    T_true = se3.tran_inv(se3.vec2tran(jnp.array([1., 1., 0, 0, 0, .1], jnp.float32)))
    err = float(jnp.linalg.norm(se3.tran2vec(se3.compose(T_true, se3.tran_inv(res.T)))))
    _emit("svd_pair", dt * 1e3, "ms/pair", transform_err=err,
          iterations=int(res.iterations))


def bench_pt2pl_pair():
    """Config #2: point-to-plane IRLS ICP with Huber trust-region loss."""
    import jax.numpy as jnp

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register_jit

    scan, mp = _pair()
    src = jnp.asarray(scan[None, :, :3])
    tgt = jnp.asarray(mp[None])
    ti = jnp.eye(4, dtype=jnp.float32)[None]
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    def run(k=0):
        return register_jit(_shift(src, k), tgt, ti, None, cfg=cfg)

    dt = _time(run)
    res = run()
    _block(res)
    T_true = se3.tran_inv(se3.vec2tran(jnp.array([1., 1., 0, 0, 0, .1], jnp.float32)))
    err = float(jnp.linalg.norm(se3.tran2vec(se3.compose(T_true, se3.tran_inv(res.T[0])))))
    _emit("pt2pl_pair", dt * 1e3, "ms/pair", transform_err=err,
          iterations=float(res.iterations[0]))


def bench_batch256():
    """Config #3: B=256 batched diff ICP, fwd+bwd (the headline; see bench.py)."""
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.registration import register

    scan, mp = _pair()
    B = 256
    src = jnp.asarray(np.stack([scan[:, :3]] * B))
    tgt = jnp.asarray(np.stack([mp] * B))
    ti = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * B))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)
    step = jax.jit(jax.value_and_grad(lambda s: jnp.sum(register(s, tgt, ti, None, cfg).T)))

    dt = _time(lambda k: step(_shift(src, k)))
    _emit("batch256_fwdbwd", B / dt, "registrations/s",
          vs_cpu_baseline=round(B / dt / 1293.0, 2))

    # IFT gradient path on the same workload
    from dicp_tpu.ift import register_ift
    step_ift = jax.jit(jax.value_and_grad(
        lambda s: jnp.sum(register_ift(s, tgt, ti, None, cfg.with_(tolerance=1e-6)).T)))
    dt_ift = _time(lambda k: step_ift(_shift(src, k)))
    _emit("batch256_fwdbwd_ift", B / dt_ift, "registrations/s",
          vs_cpu_baseline=round(B / dt_ift / 1293.0, 2))


def bench_large_cloud():
    """Config #4: 100k-point registration with Pallas kNN + voxel downsample."""
    import jax
    import jax.numpy as jnp

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ops.pallas_knn import nn_indices_pallas
    from dicp_tpu.ops.voxel import voxel_downsample
    from dicp_tpu.registration import register_jit

    rng = np.random.default_rng(0)
    n = 100_000
    # synthetic 3-D scene: three noisy planes
    normals = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    pts, nrm = [], []
    for k in range(3):
        uv = rng.uniform(-20, 20, size=(n // 3 + 1, 2)).astype(np.float32)
        basis = np.eye(3)[[i for i in range(3) if i != np.argmax(normals[k])]]
        pts.append(uv @ basis + normals[k] * (2.0 + k))
        nrm.append(np.tile(normals[k], (n // 3 + 1, 1)))
    target = jnp.asarray(np.hstack([np.vstack(pts)[:n], np.vstack(nrm)[:n]]).astype(np.float32))
    xi = jnp.asarray(np.array([0.2, -0.1, 0.05, 0.01, -0.02, 0.03], np.float32))
    T_st = se3.vec2tran(xi)
    source = target[:, :3] @ T_st[:3, :3].T + T_st[:3, 3]

    # kNN kernel timing
    dt_knn = _time(lambda k: nn_indices_pallas(_shift(source, k), target[:, :3]))
    _emit("pallas_knn_100k", dt_knn * 1e3, "ms", pairs=n * n)

    # voxel + registration end to end
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=30,
                    tolerance=1e-5, dim=3, trim_dist=2.0,
                    loss_name="huber", loss_metric=1.0, use_pallas_nn=True)

    def run(k=0):
        v = voxel_downsample(_shift(source, k), 0.5)
        return register_jit(v.points[None], target[None],
                            jnp.eye(4, dtype=jnp.float32)[None],
                            v.weight[None], cfg=cfg)

    dt = _time(run, n=3)
    res = run()
    _block(res)
    T_true = se3.tran_inv(T_st)
    err = float(jnp.linalg.norm(se3.tran2vec(se3.compose(T_true, se3.tran_inv(res.T[0])))))
    _emit("large_cloud_100k", dt * 1e3, "ms/registration", transform_err=err,
          iterations=float(res.iterations[0]))


def bench_odometry():
    """Config #5: chained odometry over a synthetic sequence + ATE."""
    import jax.numpy as jnp

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.odometry import ate, odometry

    scan, mp = _pair(np.float32)
    S = 64
    step_xi = np.array([0.05, 0.08, 0, 0, 0, 0.02], np.float32)
    step = np.asarray(se3.vec2tran(jnp.asarray(step_xi)))
    T = np.eye(4, dtype=np.float32)
    scans, poses = [], []
    for _ in range(S):
        Ti = np.linalg.inv(T)
        scans.append(np.hstack([mp[:, :3] @ Ti[:3, :3].T + Ti[:3, 3],
                                mp[:, 3:6] @ Ti[:3, :3].T]).astype(np.float32))
        poses.append(T.copy())
        T = T @ step
    scans_j = jnp.asarray(np.stack(scans))
    poses_true = jnp.asarray(np.stack(poses))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=False, max_iterations=30,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)

    def run(k=0):
        return odometry(_shift(scans_j, k), cfg)

    dt = _time(run, n=5)
    res = run()
    _block(res)
    err = float(ate(res.poses, poses_true, align=False))
    _emit("odometry_64scans", (S - 1) / dt, "pairs/s", ate=err,
          all_converged=bool(jnp.all(res.converged)))


def bench_capacity():
    """Chip-capacity probe: the headline config at B=4096 (the B=256 point is
    dispatch/latency-bound; this measures sustained registrations/s when the
    batch amortizes per-step overhead)."""
    import jax
    import jax.numpy as jnp

    from dicp_tpu.config import ICPConfig
    from dicp_tpu.ift import register_ift

    scan, mp = _pair()
    B = 4096
    src = jnp.asarray(np.broadcast_to(scan[None, :, :3], (B, scan.shape[0], 3)))
    tgt = jnp.asarray(np.broadcast_to(mp[None], (B,) + mp.shape))
    ti = jnp.asarray(np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)))
    cfg = ICPConfig(icp_type="pt2pl", differentiable=True, max_iterations=100,
                    tolerance=1e-6, dim=2, trim_dist=5.0,
                    loss_name="huber", loss_metric=1.0)
    step = jax.jit(jax.value_and_grad(
        lambda s: jnp.sum(register_ift(s, tgt, ti, None, cfg).T)))
    dt = _time(lambda k: step(_shift(src, k)), n=5)
    _emit("batch4096_fwdbwd_ift", B / dt, "registrations/s",
          vs_cpu_baseline=round(B / dt / 1293.0, 2))


def bench_pipeline():
    """End-to-end streaming odometry: disk -> native host preprocess (range
    filter + voxel hash-grid) -> prefetched host->device transfer -> TPU
    registration, one scan pair at a time (the online-SLAM serving path).
    Reports whole-pipeline frames/s and the trajectory error."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from dicp_tpu import se3
    from dicp_tpu.config import ICPConfig
    from dicp_tpu.io import ScanDataset, save_bin
    from dicp_tpu.registration import register_jit

    rng = np.random.default_rng(0)
    # synthetic 3-D scene (three planes), ~60k raw points per scan
    n_raw = 60_000
    normals = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, 1.0, 0]])
    pts = []
    for k in range(3):
        uv = rng.uniform(-20, 20, size=(n_raw // 3, 2)).astype(np.float32)
        basis = np.eye(3)[[i for i in range(3) if i != np.argmax(normals[k])]]
        pts.append(uv @ basis + normals[k] * (4.0 + k))
    scene = np.vstack(pts).astype(np.float32)

    S = 16
    step_xi = jnp.asarray(np.array([0.04, 0.02, 0.01, 0.004, 0.002, 0.01], np.float32))
    T_step = np.asarray(se3.vec2tran(step_xi))
    tmpdir = tempfile.mkdtemp(prefix="dicp_bench_")
    T = np.eye(4, dtype=np.float32)
    for i in range(S):
        Ti = np.linalg.inv(T).astype(np.float32)
        scan = scene @ Ti[:3, :3].T + Ti[:3, 3]
        save_bin(os.path.join(tmpdir, f"{i:04d}.bin"),
                 np.hstack([scan, np.zeros((scan.shape[0], 1), np.float32)]))
        T = T @ T_step

    max_pts = 4096
    cfg = ICPConfig(icp_type="pt2pt", differentiable=False, max_iterations=30,
                    tolerance=1e-5, dim=3, trim_dist=1.0,
                    loss_name="huber", loss_metric=0.5)

    def run_pipeline(shift=0.0):
        ds = ScanDataset.from_dir(tmpdir, max_points=max_pts, voxel=0.4,
                                  workers=4, prefetch=4)
        prev = None
        rels = []
        for pts_np, w_np in ds:
            # distinct inputs per run: the axon layer dedups identical
            # dispatches (see _time)
            cur = jnp.asarray(pts_np[:, :3]) + jnp.float32(shift)
            w = jnp.asarray(w_np)
            if prev is not None:
                res = register_jit(cur[None], prev[0][None],
                                   jnp.eye(4, dtype=jnp.float32)[None],
                                   w[None], cfg=cfg)
                rels.append(res.T[0])
            prev = (cur, w)
        return jnp.stack(rels)

    rels = run_pipeline()  # compile + warm cache
    _block(rels)
    t0 = time.time()
    rels = run_pipeline(1e-7)
    _block(rels)
    dt = time.time() - t0
    step_inv = jnp.broadcast_to(se3.tran_inv(jnp.asarray(T_step)), rels.shape)
    err = float(jnp.max(jnp.linalg.norm(
        jax.vmap(se3.tran2vec)(jax.vmap(se3.compose)(rels, step_inv)), axis=-1)))
    _emit("pipeline_stream", S / dt, "frames/s", rel_err=err, scans=S,
          raw_pts=n_raw, voxel_pts=max_pts)


ALL = {
    "svd_pair": bench_svd_pair,
    "pt2pl_pair": bench_pt2pl_pair,
    "batch256": bench_batch256,
    "large_cloud": bench_large_cloud,
    "odometry": bench_odometry,
    "capacity": bench_capacity,
    "pipeline": bench_pipeline,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for name in names:
        ALL[name]()
