from .factory import build_ood_method  # noqa: F401
