"""Compute ops: geometry, RANSAC voting, PnP solvers, nearest-neighbor."""

from pvnet_tpu.ops import geometry  # noqa: F401
