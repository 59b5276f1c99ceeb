from .matvec import A_x, AT_y, G_x, GT_z, P_diag, P_x, abs_data  # noqa: F401
