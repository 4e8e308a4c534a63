from . import advect_fields, ic_fields, linear_fields, tools_cv, tracer_power, zenbu_window
from .apply import apply_zcv, apply_zcv_xi
