"""Special functions: Carlson symmetric elliptic integrals, Legendre forms,
Jacobi elliptic functions and inverses, Byrd&Friedman tabulated integrals,
and closed-form polynomial root solvers.

All functions are array-native (broadcast over leading batch dims), jittable,
vmappable and differentiable. They replace the iterative C routines of the
reference (sim5elliptic.c, sim5polyroots.c) with fixed-depth duplication /
AGM schemes that run in lockstep on the TPU VPU.
"""

from .carlson import rf, rd, rc, rj, set_duplication_mode
from .legendre import (
    elliptic_k, elliptic_k_mc, elliptic_f, elliptic_f_cos, elliptic_f_sin,
    elliptic_e, elliptic_e_cos, elliptic_e_sin,
    elliptic_pi_complete, elliptic_pi_cos, elliptic_pi_sin,
)
from .jacobi import (
    jacobi_sncndn, jacobi_sn, jacobi_cn, jacobi_dn,
    jacobi_isn, jacobi_icn, jacobi_itn, icn_signed,
)
from .integrals import (
    integral_C0, integral_C1, integral_C2, integral_C2_cos,
    integral_Z1, integral_Z2,
    integral_Rm1, integral_Rm2, integral_R0, integral_R1, integral_R2,
    integral_R_r0_re, integral_R_r0_re_inf, integral_R_r0_cc, integral_R_r0_cc_inf,
    integral_R_r1_re, integral_R_r1_cc, integral_R_r2_re, integral_R_r2_cc,
    integral_R_rp_re, integral_R_rp_re_inf, integral_R_rp_cc2, integral_R_rp_cc2_inf,
    integral_R_r0_bh, integral_R_r1_bh, integral_R_r2_bh, integral_R_rp_bh,
    integral_T_m0, integral_T_m2, integral_T_mp,
    integral_T_m0_dn, integral_T_m2_dn, integral_T_mp_dn,
)
from .polyroots import (quadratic_roots, cubic_roots, quartic_roots,
                        quartic_roots_c, sort_quartic_roots,
                        polish_quartic_real_roots,
                        polish_quartic_real_roots_df)
from .interp import (Interp, interp_init, interp_eval,
                     InterpBuilder, interp_init_build,
                     INTERP_TYPE_LINLIN, INTERP_TYPE_LOGLOG,
                     INTERP_TYPE_LOGLIN, INTERP_TYPE_SPLINE,
                     INTERP_OPT_ALLOW_EXTRAPOLATION)
from .quadrature import integrate_trapezoid, integrate_simpson, gauleg, qgaus
from .roots import rtbis
from .distributions import Distrib, distrib_init, distrib_icdf, distrib_hit
