"""Compute ops: geometry, RANSAC voting, PnP solvers, FPS, rasterization."""

from pvnet_tpu.ops import geometry  # noqa: F401
from pvnet_tpu.ops import voting  # noqa: F401
from pvnet_tpu.ops import pnp  # noqa: F401
from pvnet_tpu.ops import fps  # noqa: F401
from pvnet_tpu.ops import rasterize  # noqa: F401
