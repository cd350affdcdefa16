/* Minimal external disk model implementing the reference's diskmodel_*
 * shared-library ABI (see /root/reference/src/sim5disk.c:55-111 for the
 * symbol set).  Used by tests/test_external_disk.py to prove the
 * ExternalDisk ctypes bridge end-to-end.
 *
 * The model is analytic so the test can compare the device-side
 * interpolation tables against exact values:
 *   flux(R)  = F0 * R^-3 * (1 - sqrt(rin/R))
 *   sigma(R) = 1e5 * R^-0.6
 *   ell(R)   = sqrt(R) / (1 + 1/R)
 *   vr(R)    = 0
 *   h(R)     = 0            (razor-thin; exercises the midplane fast path)
 *   dhdr(R)  = 0
 *
 * Build:  cc -shared -fPIC -O2 -o external_diskmodel.so external_diskmodel.c -lm
 */
#include <math.h>
#include <stdio.h>

static double bh_mass = 0.0;
static double bh_spin = 0.0;
static double rin = 6.0;
static const double F0 = 1.0e26;

int diskmodel_init(double M, double a, char *params) {
    (void)params;
    bh_mass = M;
    bh_spin = a;
    /* crude ISCO-ish inner edge so r_min depends on spin */
    rin = 6.0 * (1.0 - 0.5 * a);
    return 0;
}

void diskmodel_done(void) {}

char *diskmodel_name(void) { return "test-analytic-disk"; }

void diskmodel_params(FILE *out) {
    if (out) fprintf(out, "# M=%g a=%g rin=%g\n", bh_mass, bh_spin, rin);
}

double diskmodel_r_min(void) { return rin; }
double diskmodel_mdot(void) { return 0.1; }
double diskmodel_lumi(void) { return 0.05; }

double diskmodel_flux(double R) {
    if (R <= rin) return 0.0;
    return F0 * pow(R, -3.0) * (1.0 - sqrt(rin / R));
}

double diskmodel_sigma(double R) { return 1.0e5 * pow(R, -0.6); }

double diskmodel_ell(double R) { return sqrt(R) / (1.0 + 1.0 / R); }
/* the reference's Python layer binds diskmodel_l instead of
 * diskmodel_ell (sim5diskmodel.py:148) -- export both */
double diskmodel_l(double R) { return diskmodel_ell(R); }

double diskmodel_vr(double R) { (void)R; return 0.0; }
double diskmodel_h(double R) { (void)R; return 0.0; }
double diskmodel_dhdr(double R) { (void)R; return 0.0; }

double diskmodel_eval(double R, int quantity) {
    switch (quantity) {
        case 0: return diskmodel_flux(R);
        case 1: return diskmodel_sigma(R);
        case 2: return diskmodel_ell(R);
        case 3: return diskmodel_vr(R);
        case 4: return diskmodel_h(R);
        case 5: return diskmodel_dhdr(R);
    }
    return 0.0;
}
