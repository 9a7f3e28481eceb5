from .schedules import beta_schedule, gamma_schedule, PlateauScheduler, local_patience

__all__ = ["beta_schedule", "gamma_schedule", "PlateauScheduler", "local_patience"]
