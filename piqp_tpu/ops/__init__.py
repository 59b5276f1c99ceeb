from .matvec import (  # noqa: F401
    AG_x, A_x, AT_y, G_x, GT_z, PAG_x, P_diag, P_x, abs_data, add_AtGt,
)
