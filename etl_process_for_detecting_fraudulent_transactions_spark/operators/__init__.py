from .scd2 import HIGH_TS, current_view, scd2_apply_snapshot

__all__ = ["HIGH_TS", "current_view", "scd2_apply_snapshot"]
