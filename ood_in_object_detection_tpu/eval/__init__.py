from .owod_protocol import compute_metrics, voc_ap, UNKNOWN_CLASS_INDEX  # noqa: F401
