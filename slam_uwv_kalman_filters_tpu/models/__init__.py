from . import velocity_ukf

__all__ = ["velocity_ukf"]
