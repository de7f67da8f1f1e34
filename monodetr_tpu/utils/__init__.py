from .misc import create_logger, set_random_seed

__all__ = ["create_logger", "set_random_seed"]
