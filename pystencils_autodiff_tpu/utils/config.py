"""Lowering configuration and structured decision logging.

SURVEY.md §5.5/§5.6: the reference's configuration is keyword arguments and
its observability a few stray log lines in the JIT layer.  Here both are
first-class: a frozen ``LoweringConfig`` dataclass carried through the
lowerings, and a ``log_lowering_decision`` hook that records tile shapes,
VMEM budgets, halo widths and strategy choices (enable with
``PYSTENCILS_ADTPU_LOG=1`` or the standard logging config).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

logger = logging.getLogger("pystencils_autodiff_tpu.lowering")
if os.environ.get("PYSTENCILS_ADTPU_LOG"):
    logging.basicConfig(level=logging.INFO)
    logger.setLevel(logging.INFO)

__all__ = ["LoweringConfig", "log_lowering_decision"]


@dataclasses.dataclass(frozen=True)
class LoweringConfig:
    """Per-lowering knobs; ``None`` means auto-derive."""

    lowering: str = "jnp"                  # jnp | pallas | c_native
    strategy: Optional[str] = None         # pallas: whole | tiled
    tile_rows: Optional[int] = None
    interpret: Optional[bool] = None       # pallas: None = auto (off-TPU)
    dtype: Optional[str] = None            # compute dtype override
    vmem_limit_bytes: int = 96 * 1024 * 1024
    full_domain: bool = False
    accumulate: Optional[str] = None       # pairwise | dd (wide-sum mode)

    def kwargs(self) -> dict:
        out = {}
        if self.strategy is not None:
            out["strategy"] = self.strategy
        if self.tile_rows is not None:
            out["tile_rows"] = self.tile_rows
        if self.interpret is not None:
            out["interpret"] = self.interpret
        if self.dtype is not None:
            out["dtype"] = self.dtype
        if self.accumulate is not None:
            out["accumulate"] = self.accumulate
        return out


def log_lowering_decision(program_name: str, **facts) -> None:
    """Structured one-line record of a lowering decision."""
    if logger.isEnabledFor(logging.INFO):
        kv = " ".join(f"{k}={v}" for k, v in facts.items())
        logger.info("lowering %s: %s", program_name, kv)
