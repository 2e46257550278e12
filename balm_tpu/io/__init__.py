from . import pcd, poses
