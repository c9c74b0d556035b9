"""Round-3 experiment: where do the streaming pipeline's 33 ms/frame go?

Phases measured separately on the raw-60k configuration (the r2 headline:
30.5 fps at rel err 1.1e-4):

  host    — ScanDataset iteration only (disk + native preprocess + pad)
  xfer    — host + jnp.asarray h2d transfer (through the axon tunnel)
  full    — current serving loop (one solve dispatch per pair)
  batchK  — windowed batching: K consecutive pairs stacked into ONE
            batched solve dispatch (K x fewer dispatches, one K x bigger
            transfer); pairs are independent (T_init = I, consecutive
            poses near identity) so results are identical per pair

Every timed full/batch loop ends in a host fetch of all transforms, so
device work cannot be skipped (axon acks without completion).  Inputs get a
per-run shift so no dispatch is byte-identical (axon dedup).

  streamW — dicp_tpu.pipeline.stream_odometry with window W (the
            production serving loop: one transfer per scan, one dispatch
            per W pairs, fetch only at the end)

Run: timeout 590 python benchmarks/exp_pipeline.py [host xfer full batch4 stream8]
"""

import os
import sys
import tempfile
import time

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, ".")

from dicp_tpu import se3  # noqa: E402
from dicp_tpu.config import ICPConfig  # noqa: E402
from dicp_tpu.io import ScanDataset, save_bin  # noqa: E402
from dicp_tpu.registration import register_jit  # noqa: E402

S = 16
MAX_PTS = 61_440


def make_dataset():
    rng = np.random.default_rng(0)
    base = rng.uniform(-20, 20, (60_000, 3)).astype(np.float32)
    base[:, 2] = (np.sin(base[:, 0] * 0.35) * np.cos(base[:, 1] * 0.3) * 2.0
                  + rng.normal(scale=0.02, size=60_000)).astype(np.float32)
    step_xi = jnp.asarray(
        np.array([0.04, 0.02, 0.01, 0.004, 0.002, 0.01], np.float32))
    T_step = np.asarray(se3.vec2tran(step_xi))
    tmpdir = tempfile.mkdtemp(prefix="dicp_exp_pipe_")
    T = np.eye(4, dtype=np.float32)
    for i in range(S):
        Ti = np.linalg.inv(T).astype(np.float32)
        scan = base @ Ti[:3, :3].T + Ti[:3, 3]
        save_bin(os.path.join(tmpdir, f"{i:04d}.bin"),
                 np.hstack([scan, np.zeros((scan.shape[0], 1), np.float32)]))
        T = T @ T_step
    return tmpdir, T_step


CFG = ICPConfig(icp_type="pt2pt", differentiable=False, max_iterations=30,
                tolerance=1e-5, dim=3, trim_dist=1.0, loss_name="huber",
                loss_metric=0.5, nn_method="cluster")


def ds_iter(tmpdir):
    return ScanDataset.from_dir(tmpdir, max_points=MAX_PTS, voxel=None,
                                workers=4, prefetch=4)


def run_host(tmpdir, shift):
    n = 0
    for pts_np, w_np in ds_iter(tmpdir):
        n += pts_np.shape[0]
    return n


def run_xfer(tmpdir, shift):
    acc = None
    for pts_np, w_np in ds_iter(tmpdir):
        cur = jnp.asarray(pts_np[:, :3] + shift)
        w = jnp.asarray(w_np)
        acc = cur  # keep last
    return float(jnp.sum(acc))  # force the final transfer chain


def run_full(tmpdir, shift):
    prev = None
    rels = []
    for pts_np, w_np in ds_iter(tmpdir):
        cur = jnp.asarray(pts_np[:, :3] + shift)
        w = jnp.asarray(w_np)
        if prev is not None:
            res = register_jit(cur[None], prev[0][None],
                               jnp.eye(4, dtype=jnp.float32)[None],
                               w[None], cfg=CFG)
            rels.append(res.T[0])
        prev = (cur, w)
    return np.asarray(jnp.stack(rels))


def run_warm(tmpdir, shift):
    """Per-pair loop with a constant-velocity warm start: T_init for pair k
    is pair k-1's solution (a device future — no host fetch, dispatches stay
    async).  Odometry scans are consecutive, so rel_k ~= rel_{k-1}."""
    prev = None
    t_init = jnp.eye(4, dtype=jnp.float32)[None]
    rels = []
    for pts_np, w_np in ds_iter(tmpdir):
        cur = jnp.asarray(pts_np[:, :3] + shift)
        w = jnp.asarray(w_np)
        if prev is not None:
            res = register_jit(cur[None], prev[0][None], t_init,
                               w[None], cfg=CFG)
            rels.append(res.T[0])
            t_init = res.T
        prev = (cur, w)
    return np.asarray(jnp.stack(rels))


def run_batched(tmpdir, shift, K):
    """Sliding-window batching: buffer K+1 scans host-side, solve K pairs
    in one batched dispatch."""
    scans = []
    rels = []
    eyeK = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4))

    def flush(buf):
        # buf: list of (pts, w) length >= 2; consecutive pairs
        srcs = np.stack([b[0] for b in buf[1:]])
        tgts = np.stack([b[0] for b in buf[:-1]])
        ws = np.stack([b[1] for b in buf[1:]])
        k = srcs.shape[0]
        if k < K:  # pad batch to K for one compiled shape
            pad = K - k
            srcs = np.concatenate([srcs, np.repeat(srcs[-1:], pad, 0)])
            tgts = np.concatenate([tgts, np.repeat(tgts[-1:], pad, 0)])
            ws = np.concatenate([ws, np.repeat(ws[-1:], pad, 0)])
        res = register_jit(jnp.asarray(srcs), jnp.asarray(tgts), eyeK,
                           jnp.asarray(ws), cfg=CFG)
        rels.append(res.T[:k])

    for pts_np, w_np in ds_iter(tmpdir):
        scans.append((pts_np[:, :3] + shift, w_np))
        if len(scans) == K + 1:
            flush(scans)
            scans = scans[-1:]          # window overlap: last scan reused
    if len(scans) >= 2:
        flush(scans)
    return np.asarray(jnp.concatenate(rels))


def run_stream(tmpdir, shift, W, cfg=None):
    """The production pipeline (dicp_tpu.pipeline): one transfer per scan,
    one dispatch per W pairs, results fetched only at the end."""
    from dicp_tpu.pipeline import stream_odometry

    def gen():
        for pts_np, w_np in ds_iter(tmpdir):
            yield pts_np[:, :3] + shift, w_np

    out = stream_odometry(gen(), cfg or CFG, window=W)
    return np.asarray(out.rel_transforms)


def main():
    modes = sys.argv[1:] or ["host", "xfer", "full", "batch4"]
    tmpdir, T_step = make_dataset()
    step_inv = np.asarray(se3.tran_inv(jnp.asarray(T_step)))
    shift_n = 0

    for mode in modes:
        if mode == "host":
            fn = run_host
        elif mode == "xfer":
            fn = run_xfer
        elif mode == "full":
            fn = run_full
        elif mode == "warm":
            fn = run_warm
        elif mode.startswith("aa"):
            # Anderson-accelerated serving loop: same per-pair dispatch as
            # `full` but the while driver mixes the last m iterates —
            # fewer GN iterations per pair (the loop is device-bound on
            # raw 60k scans, so iterations ~ time).
            m = int(mode[2:] or 3)

            def fn(d, s, m=m):
                global CFG
                saved = CFG
                try:
                    CFG = CFG.with_(anderson_m=m, collect_histories=False)
                    return run_full(d, s)
                finally:
                    CFG = saved
        elif mode.startswith("batch"):
            K = int(mode[5:])
            fn = lambda d, s, K=K: run_batched(d, s, K)
        elif mode.startswith("stream"):
            W = int(mode[6:])
            fn = lambda d, s, W=W: run_stream(d, s, W)
        elif mode.startswith("ci"):
            # const_iter serving (round 5): warm-started windows where
            # every pair runs EXACTLY N GN iterations (scan driver, no
            # cross-pair convergence sync — the measured reason windowed
            # batching lost with the while driver).  ciN_wW.
            ni, W = mode[2:].split("_w")
            cfg_ci = CFG.with_(const_iter=True, max_iterations=int(ni),
                               collect_histories=False)
            fn = lambda d, s, W=int(W), c=cfg_ci: run_stream(d, s, W, c)
        else:
            raise SystemExit(f"unknown mode {mode}")

        fn(tmpdir, np.float32(0))  # warm: compile + page cache
        best = float("inf")
        err = None
        for _ in range(3):
            shift_n += 1
            t0 = time.time()
            out = fn(tmpdir, np.float32(shift_n * 1e-7))
            dt = time.time() - t0
            best = min(best, dt)
            if (mode in ("full", "warm") or mode.startswith("batch")
                    or mode.startswith("stream")):
                err = float(np.max([np.linalg.norm(np.asarray(se3.tran2vec(
                    jnp.asarray(r @ step_inv)))) for r in out]))
        extra = f"  rel_err={err:.2e}" if err is not None else ""
        print(f"{mode}: {best:.3f}s for {S} scans = {S/best:.1f} fps{extra}",
              flush=True)


if __name__ == "__main__":
    main()
