"""Real-TPU smoke lane (VERDICT r2 #5).

Runs on the actual chip (axon platform, f32) — the main suite pins CPU/f64
and runs Pallas kernels in interpret mode, so a Mosaic lowering or bf16
regression is invisible there.  This lane is skipped automatically when no
TPU is attached.

Invocation (documented in BENCH.md):  python -m pytest tests_tpu/ -q
(~2-4 min cold for remote compiles, cached after.)
"""

import os
import threading

import numpy as np
import pytest

import jax

# Gate on the backend, not device-name substrings: experimental platforms
# (e.g. 'axon') may expose device strings without "tpu" in them, which would
# silently skip this whole lane on the very chip it exists to cover
# (ADVICE r2).  Any non-CPU backend counts as the real-chip lane.
#
# The probe runs under a timeout: a remote-attached platform whose tunnel is
# down BLOCKS in backend init forever (observed: jax.default_backend() hangs
# >10 min during an outage), which would hang collection of the whole lane
# rather than skip it.  Timeout -> treated as no TPU.
_PROBE_S = float(os.environ.get("DICP_TPU_PROBE_TIMEOUT_S", "120"))


def _probe_backend():
    result = {}

    def run():
        try:
            result["backend"] = jax.default_backend()
        except Exception:  # noqa: BLE001 — any init failure means no chip
            result["backend"] = "cpu"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(_PROBE_S)
    if "backend" not in result:
        import warnings

        warnings.warn("TPU backend probe timed out "
                      f"({_PROBE_S:.0f}s) — treating as no TPU attached "
                      "(tunnel down?); the real-chip lane will skip")
        return "cpu"
    return result["backend"]


TPU = _probe_backend() != "cpu"

collect_ignore_glob = []  # nothing ignored; skipping is per-test via fixture


@pytest.fixture(autouse=True)
def _require_tpu():
    if not TPU:
        pytest.skip("no TPU attached (real-chip lane)")


DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "data")


@pytest.fixture
def pair_f32():
    scan = np.load(os.path.join(DATA_DIR, "points_scan.npy")).astype(np.float32)
    mp = np.load(os.path.join(DATA_DIR, "points_map.npy")).astype(np.float32)
    return scan, mp
