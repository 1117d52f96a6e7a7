// Standalone double-precision oracle for the eikonal ray math.
//
// Re-implements, from the equations, the reference renderer's eikonal core
// (MitsubaER src/medium/heterogeneousrefractive.cpp) with the exact update
// order and step schedule of:
//   * er_step            (heterogeneousrefractive.cpp:653-661)
//   * trace              (:671-691)  — full steps + one partial, step-back
//   * er_derivativestep  (:798-814)  — dp/dv0, dv/dv0 forward sensitivities
//   * boundaryVelocity   (:1036-1051) and its Jacobian factor (:1057-1074)
// in IEEE double (the reference compiles its eikonal math double via
// FLOATDEBUG, include/mitsuba/core/fwd.h:174-184).
//
// This file is written from scratch as a TEST ORACLE: the JAX
// implementation (mitsubaer_tpu/models/eikonal.py) is cross-checked against
// it step-for-step by tests/test_reference_oracle.py. It supports the
// analytic RIF/SDF pair the test scenes use:
//   RIF linear : n(p) = n0 + g . p             params: n0 gx gy gz
//   RIF radial : n(p) = n0 + a exp(-|p-c|^2/w^2)   params: n0 a w cx cy cz
//   SDF sphere : |p - c| - R                   params: cx cy cz R
//
// Usage: er_oracle MODE ARGS...
//   step   kind prm... px py pz dx dy dz h nsteps      (trace inside sphere)
//   deriv  kind prm... px py pz dx dy dz h nsteps
//   refract vx vy vz nx ny nz ni ne
// Output: whitespace-separated doubles with 17 significant digits.
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>

struct V3 {
    double x, y, z;
};
static V3 v3(double x, double y, double z) { return V3{x, y, z}; }
static V3 add(V3 a, V3 b) { return v3(a.x + b.x, a.y + b.y, a.z + b.z); }
static V3 sub(V3 a, V3 b) { return v3(a.x - b.x, a.y - b.y, a.z - b.z); }
static V3 mul(double s, V3 a) { return v3(s * a.x, s * a.y, s * a.z); }
static double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

struct M3 {
    double m[3][3];
};
static M3 zero3() { M3 r; memset(r.m, 0, sizeof r.m); return r; }
static M3 outer(V3 a, V3 b) {
    M3 r;
    double av[3] = {a.x, a.y, a.z}, bv[3] = {b.x, b.y, b.z};
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) r.m[i][j] = av[i] * bv[j];
    return r;
}
static M3 madd(M3 a, double s, M3 b) {
    M3 r;
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) r.m[i][j] = a.m[i][j] + s * b.m[i][j];
    return r;
}
static M3 mmul(M3 a, M3 b) {
    M3 r = zero3();
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++)
            for (int k = 0; k < 3; k++) r.m[i][j] += a.m[i][k] * b.m[k][j];
    return r;
}

// ----- RIF fields ---------------------------------------------------------
struct Rif {
    int kind;          // 1 = linear, 2 = radial gaussian
    double prm[8];
};

static void rif_eval(const Rif &f, V3 p, double *n, V3 *g, M3 *H) {
    if (f.kind == 1) {
        V3 gv = v3(f.prm[1], f.prm[2], f.prm[3]);
        *n = f.prm[0] + dot(p, gv);
        *g = gv;
        if (H) *H = zero3();
    } else {
        V3 c = v3(f.prm[3], f.prm[4], f.prm[5]);
        double w2 = f.prm[2] * f.prm[2];
        V3 dp = sub(p, c);
        double e = f.prm[1] * exp(-dot(dp, dp) / w2);
        *n = f.prm[0] + e;
        *g = mul(-2.0 / w2 * e, dp);
        if (H) {
            // H = (-2/w2) (e I + dp g^T)
            M3 h = zero3();
            h.m[0][0] = h.m[1][1] = h.m[2][2] = e;
            h = madd(h, 1.0, outer(dp, *g));
            for (int i = 0; i < 3; i++)
                for (int j = 0; j < 3; j++) h.m[i][j] *= -2.0 / w2;
            *H = h;
        }
    }
}

// ----- er_step (reference update order) -----------------------------------
static void er_step(const Rif &f, V3 &p, V3 &v, double h, double &opt) {
    double n;
    V3 g;
    rif_eval(f, p, &n, &g, nullptr);
    v = add(v, mul(0.5 * h, g));
    p = add(p, mul(h / n, v));
    double n2;
    V3 g2;
    rif_eval(f, p, &n2, &g2, nullptr);
    v = add(v, mul(0.5 * h, g2));
    opt += h * n;
}

static bool inside_sphere(const double *sdf, V3 p) {
    V3 c = v3(sdf[0], sdf[1], sdf[2]);
    V3 d = sub(p, c);
    return dot(d, d) < sdf[3] * sdf[3];
}

// trace(): full steps then one partial; step BACK on boundary exit (:684)
static bool trace(const Rif &f, const double *sdf, V3 &p, V3 &v,
                  double dist, double h, double &marched, double &opt) {
    int steps = (int)(dist / h);
    double rem = dist - steps * h;
    marched = 0;
    for (int i = 0; i < steps; i++) {
        er_step(f, p, v, h, opt);
        if (!inside_sphere(sdf, p)) {
            er_step(f, p, v, -h, opt);
            return false;
        }
        marched += h;
    }
    er_step(f, p, v, rem, opt);
    if (!inside_sphere(sdf, p)) {
        er_step(f, p, v, -rem, opt);
        return false;
    }
    marched += rem;
    return true;
}

static M3 mul_scale(M3 a, double s) {
    M3 r;
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) r.m[i][j] = s * a.m[i][j];
    return r;
}

// er_derivativestep (:798-814): note the second valueGradientAndHessian is
// evaluated at the UPDATED position and feeds the dpdv0 update.
static void er_deriv_step(const Rif &f, V3 &p, V3 &v, M3 &dpdv0, M3 &dvdv0,
                          double h) {
    double n;
    V3 g;
    M3 H;
    rif_eval(f, p, &n, &g, &H);
    v = add(v, mul(0.5 * h, g));
    dvdv0 = madd(dvdv0, 0.5 * h, mmul(H, dpdv0));
    p = add(p, mul(h / n, v));
    rif_eval(f, p, &n, &g, &H);
    double invn = 1.0 / n;
    M3 t = mmul(outer(v, g), dpdv0);
    t = madd(mul_scale(t, -invn * invn), invn, dvdv0);
    dpdv0 = madd(dpdv0, h, t);
    v = add(v, mul(0.5 * h, g));
    dvdv0 = madd(dvdv0, 0.5 * h, mmul(H, dpdv0));
}

static double sgn(double x) { return x >= 0 ? 1.0 : -1.0; }

// boundaryVelocity (:1036-1051): Snell for the SCALED velocity; the
// reference's TIR branch reverses the full direction (2 dotp N - v).
static bool boundary_velocity(V3 &v, V3 N, double ni, double ne) {
    double dotp = dot(v, N);
    double r = ne / ni;
    r = r * r - 1.0;
    double n2 = dot(v, v);
    double sq = r * n2 + dotp * dotp;
    if (sq < 1e-9) {
        v = sub(mul(2.0 * dotp, N), v);
        return true;  // TIR/reflection branch
    }
    sq = sqrt(sq);
    v = add(sub(v, mul(dotp, N)), mul(sgn(dotp) * sq, N));
    return false;
}

static void print_v3(V3 a) { printf("%.17g %.17g %.17g ", a.x, a.y, a.z); }
static void print_m3(M3 a) {
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) printf("%.17g ", a.m[i][j]);
}

int main(int argc, char **argv) {
    if (argc < 2) return 2;
    int a = 1;
    const char *mode = argv[a++];
    if (!strcmp(mode, "refract")) {
        V3 v = v3(atof(argv[a]), atof(argv[a + 1]), atof(argv[a + 2]));
        V3 N = v3(atof(argv[a + 3]), atof(argv[a + 4]), atof(argv[a + 5]));
        double ni = atof(argv[a + 6]), ne = atof(argv[a + 7]);
        bool tir = boundary_velocity(v, N, ni, ne);
        printf("%d ", tir ? 1 : 0);
        print_v3(v);
        printf("\n");
        return 0;
    }
    Rif f;
    f.kind = atoi(argv[a++]);
    int nprm = f.kind == 1 ? 4 : 6;
    for (int i = 0; i < 8; i++) f.prm[i] = 0;
    for (int i = 0; i < nprm; i++) f.prm[i] = atof(argv[a++]);
    V3 p = v3(atof(argv[a]), atof(argv[a + 1]), atof(argv[a + 2]));
    V3 d = v3(atof(argv[a + 3]), atof(argv[a + 4]), atof(argv[a + 5]));
    a += 6;
    double h = atof(argv[a++]);
    int nsteps = atoi(argv[a++]);
    double n0;
    V3 g0;
    rif_eval(f, p, &n0, &g0, nullptr);
    double dl = sqrt(dot(d, d));
    V3 v = mul(n0 / dl, d);  // |v| = n(p)
    if (!strcmp(mode, "step")) {
        double opt = 0;
        for (int i = 0; i < nsteps; i++) er_step(f, p, v, h, opt);
        print_v3(p);
        print_v3(v);
        printf("%.17g\n", opt);
    } else if (!strcmp(mode, "trace")) {
        // argv tail: sdf sphere params cx cy cz R, distance
        double sdf[4] = {atof(argv[a]), atof(argv[a + 1]), atof(argv[a + 2]),
                         atof(argv[a + 3])};
        double dist = atof(argv[a + 4]);
        double marched = 0, opt = 0;
        bool ok = trace(f, sdf, p, v, dist, h, marched, opt);
        printf("%d ", ok ? 1 : 0);
        print_v3(p);
        print_v3(v);
        printf("%.17g %.17g\n", marched, opt);
    } else if (!strcmp(mode, "deriv")) {
        M3 dpdv0 = zero3(), dvdv0 = zero3();
        for (int i = 0; i < 3; i++) dvdv0.m[i][i] = 1.0;
        for (int i = 0; i < nsteps; i++) er_deriv_step(f, p, v, dpdv0, dvdv0, h);
        print_v3(p);
        print_v3(v);
        print_m3(dpdv0);
        print_m3(dvdv0);
        printf("\n");
    } else {
        return 2;
    }
    return 0;
}
