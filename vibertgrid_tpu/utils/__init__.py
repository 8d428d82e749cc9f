"""Diagnostics and misc utilities."""

from vibertgrid_tpu.utils.logging import TerminalLogger, MetricsLogger, setup_seed  # noqa: F401
