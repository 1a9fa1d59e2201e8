"""Pure jittable physics ops (see individual modules for reference parity)."""
from .actuation import update_radius
from .color import bot_colors
from .forces import dense_collide, friction_velocity_update, obstacle_forces, pair_forces
from .grid import build_cell_table, cellgrid_collide
from .integrate import integrate
from .phase import in_shadow, light_distance, update_phase
