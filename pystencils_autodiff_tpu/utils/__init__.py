from .autotune import (TuneResult, autotune_chain,
                       autotune_stage_chain)
from .benchmark import (ab_timed, fetch_timed, roofline_gbps,
                        rtt_baseline, slope_timed)
from .config import LoweringConfig, log_lowering_decision
from .profiling import KernelStats, timed_region, trace

__all__ = [
    "autotune_chain",
    "autotune_stage_chain",
    "TuneResult",
    "ab_timed",
    "fetch_timed",
    "slope_timed",
    "rtt_baseline",
    "roofline_gbps",
    "LoweringConfig",
    "log_lowering_decision",
    "KernelStats",
    "timed_region",
    "trace",
]
