from .driver import Stage, Driver

__all__ = ["Stage", "Driver"]
