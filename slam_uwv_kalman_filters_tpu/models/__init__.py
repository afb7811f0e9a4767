from . import bottom_ukf, indirect_pose_ukf, pose_ukf, velocity_ukf

__all__ = ["bottom_ukf", "indirect_pose_ukf", "pose_ukf", "velocity_ukf"]
