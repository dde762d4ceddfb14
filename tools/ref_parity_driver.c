/*
 * Parity driver for the reference C engine (/root/reference).
 *
 * Built by tools/ref_parity.py against the unmodified reference sources
 * (gcc -O2, the Makefile's flags) and run to produce machine-readable
 * ground truth:
 *   BSWEEP <i> <bx> <result>   capture/escape classification for a sweep
 *                              of impact parameters (main.c:61-126 rays,
 *                              but swept densely instead of 5 samples)
 *   ORBIT <r> <v>              circular-orbit speed table (main.c:131-167)
 *   RAYS_PER_S <x>             forward-only single-thread throughput of
 *                              bh_trace_ray on this host (the vs_baseline
 *                              denominator recorded in bench.py)
 *
 * Scene setup mirrors src/main.c:200-229: M=1 Schwarzschild, step 0.1,
 * 1000 max steps, tolerance 1e-6, max distance 100M.  The sweep and the
 * timing run are no-disk (bh_initialize leaves the disk disabled,
 * blackhole_api.c:71) so only geodesic physics is compared; a second
 * sweep with the 6..20M disk configured exercises disk classification.
 */

#define _POSIX_C_SOURCE 199309L /* clock_gettime under -std=c99 */

#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#include "blackhole_api.h"
#include "raytracer.h"

static void sweep(BHContextHandle ctx, const char *tag, int n) {
    for (int i = 0; i <= n; i++) {
        double bx = 0.5 * (double)i / (double)n; /* direction x in [0,0.5] */
        double origin[3] = {0.0, 0.0, 30.0};
        double dir[3] = {bx, 0.0, -1.0};
        RayTraceHit hit;
        if (bh_trace_ray(ctx, origin, dir, &hit) != BH_SUCCESS) {
            printf("%s %d %.10f ERROR\n", tag, i, bx);
            continue;
        }
        printf("%s %d %.10f %d %.6f %d\n", tag, i, bx, (int)hit.result,
               hit.distance, hit.steps);
    }
}

int main(int argc, char **argv) {
    int n_sweep = argc > 1 ? atoi(argv[1]) : 40;
    int n_bench = argc > 2 ? atoi(argv[2]) : 4096;

    BHContextHandle ctx = bh_initialize();
    if (ctx == NULL) {
        fprintf(stderr, "bh_initialize failed\n");
        return 1;
    }
    int maj, min, pat;
    bh_get_version(&maj, &min, &pat);
    printf("VERSION %d.%d.%d\n", maj, min, pat);

    bh_configure_black_hole(ctx, 1.0, 0.0, 0.0);
    bh_configure_simulation(ctx, 0.1, 100.0, 1000, 1e-6);

    /* --- no-disk Schwarzschild capture/escape sweep --- */
    sweep(ctx, "BSWEEP", n_sweep);

    /* --- orbit table (main.c:131-167) --- */
    for (int r = 20; r <= 60; r += 10) {
        double v = 0.0;
        bh_calculate_orbital_velocity(ctx, (double)r, &v);
        printf("ORBIT %d %.12f\n", r, v);
    }

    /* --- time dilation between two radii (blackhole_api.c:432-459) --- */
    {
        double p1[3] = {10.0, 0.0, 0.0};
        double p2[3] = {50.0, 0.0, 0.0};
        double td = 0.0;
        bh_calculate_time_dilation(ctx, p1, p2, &td);
        printf("TDIL %.12f\n", td);
    }

    /* --- forward-only timing: pixel-grid rays, single thread --- */
    {
        struct timespec t0, t1;
        int side = 64;
        int done = 0;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        while (done < n_bench) {
            int i = done % (side * side);
            double px = -0.35 + 0.7 * (double)(i % side) / (double)side;
            double py = -0.35 + 0.7 * (double)(i / side) / (double)side;
            double origin[3] = {0.0, 0.0, 30.0};
            double dir[3] = {px, py, -1.0};
            RayTraceHit hit;
            bh_trace_ray(ctx, origin, dir, &hit);
            done++;
        }
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double dt = (double)(t1.tv_sec - t0.tv_sec)
                  + 1e-9 * (double)(t1.tv_nsec - t0.tv_nsec);
        printf("RAYS_PER_S %.1f\n", (double)n_bench / dt);
    }

    /* --- disk-enabled sweep --- */
    bh_configure_accretion_disk(ctx, 6.0, 20.0, 1.0, 1.0);
    sweep(ctx, "DSWEEP", n_sweep);

    bh_shutdown(ctx);
    return 0;
}
