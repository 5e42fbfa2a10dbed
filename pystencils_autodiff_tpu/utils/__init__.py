from .benchmark import fetch_timed, roofline_gbps, rtt_baseline

__all__ = ["fetch_timed", "rtt_baseline", "roofline_gbps"]
