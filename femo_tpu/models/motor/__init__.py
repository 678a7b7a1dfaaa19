from .mesh import create_motor_mesh, MotorTags
from .permeability import PiecewiseBHCurve, default_silicon_steel
from .pde import (
    em_residual_form, mesh_motion_residual_form, b_power_form, area_form,
)
from .model import build_motor_model
