from .matvec import A_xn_AT_xt, G_xn_GT_xt, P_x  # noqa: F401
