from .logging import StageTimer, log

__all__ = ["StageTimer", "log"]
