from .logging import get_logger, stage_timer, Throughput

__all__ = ["get_logger", "stage_timer", "Throughput"]
