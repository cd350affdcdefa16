// golden_dump.c -- dumps golden values from the sim5 C reference library
// (this driver is new code; it only CALLS the reference API to produce
//  oracle fixtures for the TPU rebuild's tests)
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include "src/sim5lib.h"
DEVICEFUNC double elliptic_e(double phi, double m);

static FILE* OUT;

static void dump_special(void) {
    OUT = fopen("golden/special.txt", "w");
    double xs[] = {1e-8, 1e-4, 0.01, 0.3, 1.0, 2.5, 10.0, 1e4, 1e8};
    int n = sizeof(xs)/sizeof(double);
    for (int i=0;i<n;i++) for (int j=0;j<n;j++) for (int k=0;k<n;k++) {
        double x=xs[i], y=xs[j], z=xs[k];
        fprintf(OUT, "rf %.17e %.17e %.17e %.17e\n", x,y,z, rf(x,y,z));
        if (z>0) fprintf(OUT, "rd %.17e %.17e %.17e %.17e\n", x,y,z, rd(x,y,z));
    }
    for (int i=0;i<n;i++) for (int j=0;j<n;j++) {
        fprintf(OUT, "rc %.17e %.17e %.17e\n", xs[i], xs[j], rc(xs[i], xs[j]));
        fprintf(OUT, "rc %.17e %.17e %.17e\n", xs[i], -xs[j], rc(xs[i], -xs[j]));
    }
    double ps[] = {0.1, 1.0, 7.3};
    for (int i=0;i<n;i+=2) for (int j=0;j<n;j+=2) for (int k=0;k<n;k+=2) for (int l=0;l<3;l++) {
        fprintf(OUT, "rj %.17e %.17e %.17e %.17e %.17e\n", xs[i],xs[j],xs[k],ps[l], rj(xs[i],xs[j],xs[k],ps[l]));
        fprintf(OUT, "rj %.17e %.17e %.17e %.17e %.17e\n", xs[i],xs[j],xs[k],-ps[l], rj(xs[i],xs[j],xs[k],-ps[l]));
    }
    double ms[] = {0.0, 1e-6, 0.1, 0.5, 0.9, 0.99, 0.999999};
    double us[] = {-3.0, -1.0, -0.3, 0.0, 0.05, 0.5, 1.0, 2.0, 3.5};
    for (int i=0;i<7;i++) {
        double m = ms[i];
        fprintf(OUT, "ek %.17e %.17e\n", m, elliptic_k(m));
        for (int j=0;j<9;j++) {
            double u = us[j];
            fprintf(OUT, "ef %.17e %.17e %.17e\n", u, m, elliptic_f(u, m));
            if (u>=0 && u<=M_PI) fprintf(OUT, "ee %.17e %.17e %.17e\n", u, m, elliptic_e(u, m));
            double K = elliptic_k(m);
            if (u >= 0.0 && u <= 2.0*K) {
                double sn,cn,dn; jacobi_sncndn(u, m, &sn, &cn, &dn);
                fprintf(OUT, "sncndn %.17e %.17e %.17e %.17e %.17e\n", u, m, sn, cn, dn);
            }
        }
        double zs[] = {-0.99, -0.6, -0.2, 0.01, 0.3, 0.7, 0.999};
        for (int j=0;j<7;j++) {
            fprintf(OUT, "isn %.17e %.17e %.17e\n", zs[j], m, jacobi_isn(zs[j], m));
            fprintf(OUT, "icn %.17e %.17e %.17e\n", zs[j], m, jacobi_icn(zs[j], m));
            fprintf(OUT, "itn %.17e %.17e %.17e\n", zs[j], m, jacobi_itn(zs[j], m));
        }
    }
    // Byrd&Friedman tabulated integrals used by azm/timedelay
    // integral_T_mp(a2,b2,p,X)
    double a2s[] = {0.3, 2.0, 17.0};
    double b2s[] = {0.2, 0.8};
    for (int i=0;i<3;i++) for (int j=0;j<2;j++) {
        double Xs[] = {-0.4, -0.1, 0.0, 0.2, 0.44};
        for (int k=0;k<5;k++) {
            double X = Xs[k]*sqrt(b2s[j])/0.45;
            fprintf(OUT, "Tmp %.17e %.17e %.17e %.17e %.17e\n", a2s[i], b2s[j], 1.0, X,
                integral_T_mp(a2s[i], b2s[j], 1.0, X));
            fprintf(OUT, "Tm0 %.17e %.17e %.17e %.17e\n", a2s[i], b2s[j], fabs(X),
                integral_T_m0(a2s[i], b2s[j], fabs(X)));
            fprintf(OUT, "Tm2 %.17e %.17e %.17e %.17e\n", a2s[i], b2s[j], fabs(X),
                integral_T_m2(a2s[i], b2s[j], fabs(X)));
        }
    }
    // integral_R_rp_re / _inf: need X > a > b > c > d ordering
    {
        double ra=6.0, rb=2.2, rc_=1.1, rd_=-9.3;
        double ps2[] = {1.9, 0.5};
        for (int i=0;i<2;i++) {
            fprintf(OUT, "Rrp_inf %.17e %.17e %.17e %.17e %.17e %.17e\n", ra,rb,rc_,rd_,ps2[i],
                integral_R_rp_re_inf(ra,rb,rc_,rd_,ps2[i]));
            double Xs[] = {6.5, 9.0, 40.0};
            for (int k=0;k<3;k++)
                fprintf(OUT, "Rrp %.17e %.17e %.17e %.17e %.17e %.17e %.17e\n", ra,rb,rc_,rd_,ps2[i],Xs[k],
                    integral_R_rp_re(ra,rb,rc_,rd_,ps2[i],Xs[k]));
        }
        for (int k=0;k<3;k++) {
            double Xs[] = {6.5, 9.0, 40.0};
            fprintf(OUT, "Rr0 %.17e %.17e %.17e %.17e %.17e %.17e\n", ra,rb,rc_,rd_,Xs[k],
                integral_R_r0_re(ra,rb,rc_,rd_,Xs[k]));
            fprintf(OUT, "Rr1 %.17e %.17e %.17e %.17e %.17e %.17e\n", ra,rb,rc_,rd_,Xs[k],
                integral_R_r1_re(ra,rb,rc_,rd_,Xs[k]));
            fprintf(OUT, "Rr2 %.17e %.17e %.17e %.17e %.17e %.17e\n", ra,rb,rc_,rd_,Xs[k],
                integral_R_r2_re(ra,rb,rc_,rd_,Xs[k]));
        }
    }
    fclose(OUT);
}

static void dump_kerr(void) {
    OUT = fopen("golden/kerr.txt", "w");
    double as[] = {1e-4, 0.3, 0.7, 0.93, 0.998};
    double rs[] = {1.6, 2.5, 4.0, 8.0, 25.0, 400.0};
    double mms[] = {-0.9, -0.4, 0.01, 0.35, 0.8};
    for (int i=0;i<5;i++) {
        double a = as[i];
        fprintf(OUT, "orbit %.17e %.17e %.17e %.17e %.17e\n", a, r_bh(a), r_ms(a), r_mb(a), r_ph(a));
        for (int j=0;j<6;j++) {
            double r = rs[j];
            fprintf(OUT, "kepler %.17e %.17e %.17e %.17e %.17e %.17e %.17e\n",
                a, r, OmegaK(r,a), ellK(r,a), omega_r(r,a), omega_z(r,a), gfactorK(r,a, ellK(r,a)));
            for (int k=0;k<5;k++) {
                double m = mms[k];
                sim5metric g, gi;
                kerr_metric(a, r, m, &g);
                kerr_metric_contravariant(a, r, m, &gi);
                fprintf(OUT, "metric %.17e %.17e %.17e  %.17e %.17e %.17e %.17e %.17e\n",
                    a, r, m, g.g00, g.g11, g.g22, g.g33, g.g03);
                fprintf(OUT, "imetric %.17e %.17e %.17e  %.17e %.17e %.17e %.17e %.17e\n",
                    a, r, m, gi.g00, gi.g11, gi.g22, gi.g33, gi.g03);
                double G[4][4][4];
                kerr_connection(a, r, m, G);
                fprintf(OUT, "conn %.17e %.17e %.17e ", a, r, m);
                // dump full symmetric Gamma^i_jk with the 2x convention UNDONE:
                // true Gamma[i][j][k] (j<k) = 0.5*G[i][j][k]; diagonal = G[i][j][j]
                for (int ii=0;ii<4;ii++) for (int jj=0;jj<4;jj++) for (int kk=jj;kk<4;kk++) {
                    double v = (jj==kk) ? G[ii][jj][kk] : 0.5*G[ii][jj][kk];
                    fprintf(OUT, "%.17e ", v);
                }
                fprintf(OUT, "\n");
                sim5tetrad t;
                tetrad_zamo(&g, &t);
                fprintf(OUT, "tzamo %.17e %.17e %.17e ", a, r, m);
                for (int ii=0;ii<4;ii++) for (int jj=0;jj<4;jj++) fprintf(OUT, "%.17e ", t.e[ii][jj]);
                fprintf(OUT, "\n");
                double Om = 0.4*OmegaK(r,a);
                tetrad_azimuthal(&g, Om, &t);
                fprintf(OUT, "tazm %.17e %.17e %.17e %.17e ", a, r, m, Om);
                for (int ii=0;ii<4;ii++) for (int jj=0;jj<4;jj++) fprintf(OUT, "%.17e ", t.e[ii][jj]);
                fprintf(OUT, "\n");
                tetrad_surface(&g, Om, 0.1, 0.05, &t);
                fprintf(OUT, "tsurf %.17e %.17e %.17e %.17e ", a, r, m, Om);
                for (int ii=0;ii<4;ii++) for (int jj=0;jj<4;jj++) fprintf(OUT, "%.17e ", t.e[ii][jj]);
                fprintf(OUT, "\n");
                // photon momentum for sample motion constants
                double l = 0.3*r, q = 0.2*r*r;
                double R = sqr(r*r+a*a-a*l) - (r*r-2.*r+a*a)*(sqr(l-a)+q);
                double M = q - l*l*m*m/(1.-m*m) + a*a*m*m;
                if (R>0 && M>0) {
                    double kv[4];
                    photon_momentum(a, r, m, l, q, 1.0, -1.0, kv);
                    fprintf(OUT, "pmom %.17e %.17e %.17e %.17e %.17e  %.17e %.17e %.17e %.17e\n",
                        a, r, m, l, q, kv[0], kv[1], kv[2], kv[3]);
                    double l2, q2;
                    photon_motion_constants(a, r, m, kv, &l2, &q2);
                    fprintf(OUT, "pmc %.17e %.17e %.17e  %.17e %.17e\n", a, r, m, l2, q2);
                    fprintf(OUT, "carter %.17e %.17e %.17e  %.17e\n", a, r, m, photon_carter_const(kv, &g));
                }
            }
        }
    }
    fclose(OUT);
}

static void dump_geod(void) {
    OUT = fopen("golden/geod.txt", "w");
    double as[] = {1e-4, 0.5, 0.9, 0.998};
    double incs[] = {30.0, 60.0, 85.0};
    for (int ia=0; ia<4; ia++) for (int ii=0; ii<3; ii++) {
        double a = as[ia];
        double inc = incs[ii]*M_PI/180.0;
        for (int ix=0; ix<9; ix++) for (int iy=0; iy<9; iy++) {
            double alpha = -16.0 + 4.0*ix;
            double beta  = -16.0 + 4.0*iy;
            geodesic g;
            int err = 0;
            int ok = geodesic_init_inf(inc, a, alpha, beta, &g, &err);
            fprintf(OUT, "ginit %.17e %.17e %.17e %.17e  %d %d ", a, inc, alpha, beta, ok, err);
            if (!ok) { fprintf(OUT, "\n"); continue; }
            fprintf(OUT, "%.17e %.17e %d %d  %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e  %.17e %.17e %.17e %.17e  %.17e %.17e %.17e\n",
                g.l, g.q, g.nrr, g.type,
                creal(g.r1), cimag(g.r1), creal(g.r2), cimag(g.r2),
                creal(g.r3), cimag(g.r3), creal(g.r4), cimag(g.r4),
                g.m2p, g.m2m, g.mm, g.mK, g.rp, g.Rpc, g.Tpp);
            fprintf(OUT, "gtip %.17e\n", g.Tip);
            // midplane crossings
            for (int ord=0; ord<2; ord++) {
                double P = geodesic_find_midplane_crossing(&g, ord);
                double r = isnan(P) ? NAN : geodesic_position_rad(&g, P);
                fprintf(OUT, "gmid %d %.17e %.17e\n", ord, P, r);
            }
            // position samples along trajectory
            for (int ip=1; ip<=6; ip++) {
                double P = 0.3*ip*g.Rpc;
                if ((g.type==GEOD_TYPE_RC || g.type==GEOD_TYPE_CC) && P>=g.Rpc) continue;
                if (P<=0 || P>=2.*g.Rpc) continue;
                double r = geodesic_position_rad(&g, P);
                double m = geodesic_position_pol(&g, P);
                double phi = (isnan(r)||isnan(m)) ? NAN : geodesic_position_azm(&g, r, m, P);
                double kv[4] = {NAN,NAN,NAN,NAN};
                if (!isnan(r) && !isnan(m)) geodesic_momentum(&g, P, r, m, kv);
                fprintf(OUT, "gpos %.17e %.17e %.17e %.17e  %.17e %.17e %.17e %.17e\n",
                    P, r, m, phi, kv[0], kv[1], kv[2], kv[3]);
            }
            // P_int at radii
            double rr[3] = {g.rp*1.05, 10.0, 100.0};
            for (int k2=0;k2<3;k2++) {
                if (rr[k2] < g.rp) continue;
                double P0 = geodesic_P_int(&g, rr[k2], 0);
                double P1 = geodesic_P_int(&g, rr[k2], 1);
                fprintf(OUT, "gpint %.17e %.17e %.17e\n", rr[k2], P0, P1);
            }
        }
    }
    fclose(OUT);
}

static void dump_image(const char* fname, double a, double inc_deg, int N) {
    OUT = fopen(fname, "w");
    double inc = inc_deg*M_PI/180.;
    double rms = r_ms(a);
    double rmax = rms + 8.0;
    disk_nt_setup(10.0, a, 0.1, 0.1, 0);
    fprintf(OUT, "# a=%.6f inc_deg=%.6f N=%d rms=%.17e rmax=%.17e\n", a, inc_deg, N, rms, rmax);
    for (int iy=0; iy<N; iy++) for (int ix=0; ix<N; ix++) {
        double alpha = (((double)(ix)+.5)/(double)(N)-0.5)*2.0*rmax;
        double beta  = (((double)(iy)+.5)/(double)(N)-0.5)*2.0*rmax;
        int error;
        double P, r, g=0.0, f=0.0;
        geodesic gd;
        double F = 0.0;
        geodesic_init_inf(inc, a, alpha, beta, &gd, &error);
        if (!error) {
            P = geodesic_find_midplane_crossing(&gd, 0);
            if (!isnan(P)) {
                r = geodesic_position_rad(&gd, P);
                if (!isnan(r) && r >= rms) {
                    g = gfactorK(r, a, gd.l);
                    f = disk_nt_flux(r);
                    F = f*pow(g,4.);
                } else {
                    P = geodesic_find_midplane_crossing(&gd, 1);
                    if (!isnan(P)) {
                        r = geodesic_position_rad(&gd, P);
                        if (!isnan(r) && r >= rms) {
                            g = gfactorK(r, a, gd.l);
                            f = disk_nt_flux(r);
                            F = f*pow(g,4.);
                        }
                    }
                }
            }
        }
        fprintf(OUT, "%d %d %.17e %.17e\n", iy, ix, F, g);
    }
    fclose(OUT);
}

static void dump_disknt(void) {
    OUT = fopen("golden/disknt.txt", "w");
    double as[] = {0.0, 0.5, 0.9, 0.998};
    for (int i=0;i<4;i++) {
        double a = as[i];
        disk_nt_setup(10.0, a, 0.1, 0.1, 0);
        fprintf(OUT, "setup %.17e %.17e %.17e\n", a, disk_nt_r_min(), disk_nt_lumi());
        for (double r=disk_nt_r_min()*1.01; r<2e4; r*=1.7) {
            fprintf(OUT, "prof %.17e %.17e %.17e %.17e %.17e\n",
                a, r, disk_nt_flux(r), disk_nt_sigma(r), disk_nt_ell(r));
        }
    }
    // luminosity mode
    disk_nt_setup(10.0, 0.7, 0.1, 0.1, DISK_NT_OPTION_LUMINOSITY);
    fprintf(OUT, "lmode %.17e %.17e\n", 0.7, disk_nt_mdot());
    fclose(OUT);
}

static void dump_raytrace(void) {
    OUT = fopen("golden/raytrace.txt", "w");
    // deterministic set of rays; integrate and dump final state + conserved checks
    sim5seed(42);
    for (int i=0; i<40; i++) {
        double a = sim5urand()*0.999;
        double inc = (5. + 80.*sim5urand())*M_PI/180.;
        double rr = 4. + sim5urand()*10.;
        double x[4], k[4];
        sim5metric m;
        sim5tetrad t;
        vector_set(x, 0.0, rr, cos(inc), 0.0);
        kerr_metric(a, x[1], x[2], &m);
        tetrad_zamo(&m, &t);
        double th = sim5urand()*M_PI, ph = sim5urand()*2.*M_PI;
        double kloc[4];
        vector_set(kloc, 1.0, sin(th)*cos(ph), sin(th)*sin(ph), cos(th));
        on2bl(kloc, k, &t);
        fprintf(OUT, "ray0 %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e\n",
            a, x[0], x[1], x[2], x[3], k[0], k[1], k[2], k[3], dotprod(k,k,&m));
        raytrace_data rtd;
        raytrace_prepare(a, x, k, 0.01, 0, &rtd);
        int steps = 0;
        while (1) {
            double dl = 1e9;
            raytrace(x, k, &dl, &rtd);
            steps++;
            if (x[1] < 1.05*r_bh(a)) break;
            if (x[1] > 1e4) break;
            if (rtd.error > 1e-2) break;
            if (steps > 50000) break;
        }
        double err = raytrace_error(x, k, &rtd);
        fprintf(OUT, "rayN %d %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e %.17e\n",
            steps, x[0], x[1], x[2], x[3], k[0], k[1], k[2], k[3], err);
    }
    fclose(OUT);
}

static void dump_polarization(void) {
    OUT = fopen("golden/polarization.txt", "w");
    sim5seed(7);
    for (int i=0; i<30; i++) {
        double a = sim5urand()*0.999;
        double r = 3. + sim5urand()*20.;
        double mm = -0.8 + 1.6*sim5urand();
        sim5metric m;
        sim5tetrad t;
        kerr_metric(a, r, mm, &m);
        tetrad_zamo(&m, &t);
        double th = sim5urand()*M_PI, ph = sim5urand()*2.*M_PI;
        double kloc[4], k[4], floc[4], f[4];
        vector_set(kloc, 1.0, sin(th)*cos(ph), sin(th)*sin(ph), cos(th));
        // f orthogonal to k in local frame: pick any perpendicular spatial direction
        double e1[3] = {-sin(ph), cos(ph), 0.0};
        vector_set(floc, 0.0, e1[0], e1[1], e1[2]);
        on2bl(kloc, k, &t);
        on2bl(floc, f, &t);
        sim5complex wp = polarization_constant(k, f, &m);
        fprintf(OUT, "wp %.17e %.17e %.17e  %.17e %.17e %.17e %.17e  %.17e %.17e %.17e %.17e  %.17e %.17e\n",
            a, r, mm, k[0],k[1],k[2],k[3], f[0],f[1],f[2],f[3], creal(wp), cimag(wp));
        double f2[4];
        polarization_vector(k, wp, &m, f2);
        fprintf(OUT, "pvec %.17e %.17e %.17e %.17e\n", f2[0], f2[1], f2[2], f2[3]);
    }
    // angle rotation samples
    for (int i=0;i<10;i++) {
        double a = 0.9, inc=1.0, alpha=-5.+i, beta=3.0;
        sim5complex wp = polarization_constant_infinity(a, alpha, beta, inc);
        double chi = polarization_angle_rotation(a, inc, alpha, beta, wp);
        fprintf(OUT, "prot %.17e %.17e %.17e %.17e %.17e %.17e %.17e\n",
            a, inc, alpha, beta, creal(wp), cimag(wp), chi);
    }
    fclose(OUT);
}

int main(void) {
    system("mkdir -p golden");
    dump_special();
    dump_kerr();
    dump_geod();
    dump_disknt();
    dump_image("golden/image128_a0.txt", 0.0, 60.0, 128);
    dump_image("golden/image128_a998.txt", 0.998, 80.0, 128);
    dump_raytrace();
    dump_polarization();
    fprintf(stderr, "golden dump complete\n");
    return 0;
}
