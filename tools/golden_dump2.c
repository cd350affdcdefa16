// golden_dump2.c -- supplementary oracle fixtures: timedelay samples
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
#include "src/sim5lib.h"

int main(void) {
    FILE* OUT = fopen("golden/timedelay.txt", "w");
    double as[] = {1e-4, 0.5, 0.9};
    double incs[] = {35.0, 70.0};
    for (int ia=0; ia<3; ia++) for (int ii=0; ii<2; ii++) {
        double a = as[ia];
        double inc = incs[ii]*M_PI/180.0;
        for (int ix=0; ix<5; ix++) for (int iy=0; iy<5; iy++) {
            double alpha = -10.0 + 5.0*ix;
            double beta  = -10.0 + 5.0*iy;
            geodesic g;
            int err = 0;
            if (!geodesic_init_inf(inc, a, alpha, beta, &g, &err)) continue;
            double P2 = geodesic_find_midplane_crossing(&g, 0);
            if (isnan(P2)) continue;
            double r2 = geodesic_position_rad(&g, P2);
            if (isnan(r2)) continue;
            double P1 = P2 * 0.2;
            double r1 = geodesic_position_rad(&g, P1);
            double m1 = geodesic_position_pol(&g, P1);
            if (isnan(r1) || isnan(m1)) continue;
            double dt = geodesic_timedelay(&g, P1, r1, m1, P2, r2, 0.0);
            fprintf(OUT, "td %.17e %.17e %.17e %.17e  %.17e %.17e %.17e %.17e %.17e  %.17e\n",
                a, inc, alpha, beta, P1, r1, m1, P2, r2, dt);
        }
    }
    fclose(OUT);
    fprintf(stderr, "timedelay golden done\n");
    return 0;
}
