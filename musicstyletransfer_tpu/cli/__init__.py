from .flags import build_parser, get_config

__all__ = ["build_parser", "get_config"]
