from .jobs import streaming_ctr_windows, streaming_engagement_windows
from .stateful import streaming_anomaly_alerts

__all__ = [
    "streaming_ctr_windows",
    "streaming_engagement_windows",
    "streaming_anomaly_alerts",
]
