from .rewrites import dedup_within_watermark

__all__ = ["dedup_within_watermark"]
