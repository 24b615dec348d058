from .vqa_network import VQANetwork  # noqa: F401
