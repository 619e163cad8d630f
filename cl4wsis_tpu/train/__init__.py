from cl4wsis_tpu.train import losses, schedule

__all__ = ["losses", "schedule"]
