from .config import WooferConfig, woofer
from . import kinematics, srb, gait, planner, swing, controller
