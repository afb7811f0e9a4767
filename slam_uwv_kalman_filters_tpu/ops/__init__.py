from . import dynamics, geodesy, manifolds, ukf

__all__ = ["dynamics", "geodesy", "manifolds", "ukf"]
