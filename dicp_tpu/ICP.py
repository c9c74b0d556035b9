"""Compat shim: ``from dicp_tpu.ICP import ICP`` mirrors the reference's
``from dICP.ICP import ICP`` import path (dICP/ICP.py:14)."""

from dicp_tpu.api import ICP, batch_size_handling  # noqa: F401
from dicp_tpu.svd_icp import pt2pt_svd_icp  # noqa: F401
