from .config import CUSTOM_HYP, Hyperparams, hyperparams_to_dict, set_by_dotted_path  # noqa: F401
