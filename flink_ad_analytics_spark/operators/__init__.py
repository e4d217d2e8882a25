from .ctr import attribute_clicks, ctr_windows
from .engagement import engagement_windows
from .anomaly import detect_anomalies

__all__ = [
    "attribute_clicks",
    "ctr_windows",
    "engagement_windows",
    "detect_anomalies",
]
