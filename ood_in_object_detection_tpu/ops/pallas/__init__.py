from .distance import min_group_distances, min_group_distances_ref  # noqa: F401
