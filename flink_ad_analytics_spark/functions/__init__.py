from .hashing import hex_minhash_term, md5_fingerprint
from .time import epoch_millis_to_ts, epoch_nanos_to_ts, tumble

__all__ = [
    "hex_minhash_term",
    "md5_fingerprint",
    "epoch_millis_to_ts",
    "epoch_nanos_to_ts",
    "tumble",
]
