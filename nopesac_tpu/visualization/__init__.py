from .vis2d import create_instances, draw_match, get_labeled_seg  # noqa: F401
