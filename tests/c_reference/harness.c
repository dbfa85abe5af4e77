/*
 * Ground-truth harness around the reference's Lua-free C math.
 *
 * tests/c_reference/extract.py pulls the real functions out of
 * /root/reference/engine/NQ/fisheye.c and common/mathlib.c into
 * ref_extracted.c, which this file #includes as one translation unit.
 * This file supplies only the environment the extracted code expects:
 *
 *  - the struct declarations (globe/lens/zoom/rubix/lens_builder and the
 *    GLOBEPIXEL/LENSPIXEL macros), transcribed from fisheye.c:306-528;
 *  - engine service stubs (Con_Printf, Hunk_TempAlloc, COM_WriteFile);
 *  - the Lua boundary (LUAtoC_lens_inverse/forward/globe_plate,
 *    fisheye.c:1545-1650) with C transliterations of the Lua lens/globe
 *    scripts standing in for the Lua 5.2 VM.  Lua numbers are C doubles
 *    and Lua's math.* are the C library functions, so an order-faithful
 *    transliteration computes bit-identical values.  The vec3_t (float)
 *    truncations at the boundary are exactly where the reference has
 *    them: CtoLUA_latlon_to_ray passes through a vec3_t
 *    (fisheye.c:1494-1505), LUAtoC_lens_inverse stores the returned
 *    doubles into a vec3_t and VectorNormalize()s it (fisheye.c:1556-1566).
 *
 * Build:  gcc -O2 -std=gnu11 -o harness harness.c -lm
 * (x86-64 baseline: SSE2 scalar float/double, no FMA contraction, which
 * matches how the reference engine builds.)
 */

#include <math.h>
#include <stdio.h>
#include <stdarg.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef unsigned char byte;
typedef enum { false, true } qboolean;
typedef float vec_t;              /* engine/include/mathlib.h:30 */
typedef vec_t vec3_t[3];
#define DotProduct(x,y) (x[0]*y[0]+x[1]*y[1]+x[2]*y[2])  /* mathlib.h:70 */
#define LittleShort(x) (x)        /* little-endian host */

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

/* pcx_t, NQ/client.h:377-391 (all members naturally aligned, header is
 * 128 bytes with `data` as the first image byte) */
typedef struct {
    char manufacturer;
    char version;
    char encoding;
    char bits_per_pixel;
    unsigned short xmin, ymin, xmax, ymax;
    unsigned short hres, vres;
    unsigned char palette[48];
    char reserved;
    char color_planes;
    unsigned short bytes_per_line;
    unsigned short palette_type;
    char filler[58];
    unsigned char data;
} pcx_t;

/* ------------------------------------------------------------------ */
/* state structs, transcribed from fisheye.c:306-528 (fields the        */
/* extracted functions touch; same names, same types)                   */
/* ------------------------------------------------------------------ */

static struct _lens_builder {
    qboolean working;
    clock_t start_time;
    float seconds_per_frame;
    struct { int ly; } inverse_state;
    struct { int *top; int *bot; int plate_index; int py; } forward_state;
} lens_builder;

static struct _lua_refs {
    int lens_forward;
    int lens_inverse;
    int globe_plate;
} lua_refs;

static struct _globe {
    char name[50];
    qboolean valid;
    qboolean changed;
    byte *pixels;
#define GLOBEPIXEL(plate,x,y) (globe.pixels + (plate)*(globe.platesize)*(globe.platesize) + (x) + (y)*(globe.platesize))
#define MAX_PLATES 6
    struct {
        vec3_t forward;
        vec3_t right;
        vec3_t up;
        vec_t fov;
        vec_t dist;
        byte palette[256];
        int display;
    } plates[MAX_PLATES];
    int numplates;
    int platesize;
    struct { qboolean should; int with_margins; char name[32]; } save;
} globe;

static struct _lens {
    qboolean valid;
    qboolean changed;
    char name[50];
    enum { MAP_NONE, MAP_INVERSE, MAP_FORWARD } map_type;
    double width, height;
    double scale;
    int width_px, height_px;
    byte **pixels;
#define LENSPIXEL(x,y) (lens.pixels + (x) + (y)*lens.width_px)
    byte *pixel_tints;
#define LENSPIXELTINT(x,y) (lens.pixel_tints + (x) + (y)*lens.width_px)
} lens;

static struct _zoom {
    qboolean changed;
    enum { ZOOM_NONE, ZOOM_FOV, ZOOM_VFOV, ZOOM_COVER, ZOOM_CONTAIN } type;
    int fov;
    int max_vfov, max_fov;
} zoom;

static struct _rubix {
    qboolean enabled;
    int numcells;
    double cell_size;
    double pad_size;
} rubix;

static byte *host_basepal;

/* ------------------------------------------------------------------ */
/* engine service stubs                                                */
/* ------------------------------------------------------------------ */

void Con_Printf(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stderr, fmt, ap);
    va_end(ap);
}

void *Hunk_TempAlloc(int size) { return malloc(size); }

static const char *com_writefile_path; /* set per run: output file for COM_WriteFile */

void COM_WriteFile(const char *filename, const void *data, int len)
{
    (void)filename;
    FILE *f = fopen(com_writefile_path, "wb");
    if (!f) { perror("COM_WriteFile"); exit(1); }
    fwrite(data, 1, len, f);
    fclose(f);
}

/* ------------------------------------------------------------------ */
/* the extracted reference code                                        */
/* ------------------------------------------------------------------ */

#include "ref_extracted.c"

/* ------------------------------------------------------------------ */
/* Lua builtins as the scripts see them (fisheye.c:1494-1537):         */
/* the C converters with the vec3_t float pass-through                 */
/* ------------------------------------------------------------------ */

static void lua_latlon_to_ray(double lat, double lon, double *x, double *y, double *z)
{
    vec3_t ray;
    latlon_to_ray(lat, lon, ray);
    *x = ray[0]; *y = ray[1]; *z = ray[2];
}

static void lua_ray_to_latlon(double x, double y, double z, double *lat, double *lon)
{
    vec3_t ray = { x, y, z };
    ray_to_latlon(ray, lat, lon);
}

/* ------------------------------------------------------------------ */
/* lens scripts, transliterated from game/lua-scripts/lenses/*.lua     */
/* (status: 1 = values returned, 0 = Lua nil)                          */
/* ------------------------------------------------------------------ */

/* panini.lua (d = 1) */
static int inv_panini(double x, double y, double *X, double *Y, double *Z)
{
    double d = 1;
    double k = x*x/((d+1)*(d+1));
    double dscr = k*k*d*d - (k+1)*(k*d*d-1);
    double clon = (-k*d+sqrt(dscr))/(k+1);
    double S = (d+1)/(d+clon);
    double lon = atan2(x,S*clon);
    double lat = atan2(y,S);
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_panini(double x, double y, double z, double *X, double *Y)
{
    double d = 1, lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double S = (d+1)/(d+cos(lon));
    *X = S*sin(lon);
    *Y = S*tan(lat);
    return 1;
}

/* stereographic.lua (angleScale = 0.5) */
static int inv_stereographic(double x, double y, double *X, double *Y, double *Z)
{
    double angleScale = 0.5;
    double r = sqrt(x*x+y*y);
    double theta = atan(r)/angleScale;
    double s = sin(theta);
    *X = x/r*s; *Y = y/r*s; *Z = cos(theta);
    return 1;
}
static int fwd_stereographic(double x, double y, double z, double *X, double *Y)
{
    double angleScale = 0.5;
    double theta = acos(z);
    double r = tan(theta*angleScale);
    double c = r/sqrt(x*x+y*y);
    *X = x*c; *Y = y*c;
    return 1;
}

/* rectilinear.lua */
static int inv_rectilinear(double x, double y, double *X, double *Y, double *Z)
{
    double r = sqrt(x*x+y*y);
    double theta = atan(r);
    double s = sin(theta);
    *X = x/r*s; *Y = y/r*s; *Z = cos(theta);
    return 1;
}
static int fwd_rectilinear(double x, double y, double z, double *X, double *Y)
{
    double theta = acos(z);
    double r = tan(theta);
    double c = r/sqrt(x*x+y*y);
    *X = x*c; *Y = y*c;
    return 1;
}

/* fisheye1.lua */
static int inv_fisheye1(double x, double y, double *X, double *Y, double *Z)
{
    double r = sqrt(x*x+y*y);
    if (r > M_PI) return 0;
    double theta = r;
    double s = sin(theta);
    *X = x/r*s; *Y = y/r*s; *Z = cos(theta);
    return 1;
}
static int fwd_fisheye1(double x, double y, double z, double *X, double *Y)
{
    double theta = acos(z);
    double r = theta;
    double c = r/sqrt(x*x+y*y);
    *X = x*c; *Y = y*c;
    return 1;
}

/* equirect.lua */
static int inv_equirect(double x, double y, double *X, double *Y, double *Z)
{
    if (fabs(y) > M_PI/2 || fabs(x) > M_PI) return 0;
    double lon = x;
    double lat = y;
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_equirect(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon; *Y = lat;
    return 1;
}

/* mercator.lua */
static int inv_mercator(double x, double y, double *X, double *Y, double *Z)
{
    if (fabs(x) > M_PI) return 0;
    double lon = x;
    double lat = atan(sinh(y));
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_mercator(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon;
    *Y = log(tan(M_PI*0.25+lat*0.5));
    return 1;
}

/* hammer.lua */
static int inv_hammer(double x, double y, double *X, double *Y, double *Z)
{
    if (x*x/8+y*y/2 > 1) return 0;
    double z = sqrt(1-0.0625*x*x-0.25*y*y);
    double lon = 2*atan(z*x/(2*(2*z*z-1)));
    double lat = asin(z*y);
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_hammer(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = 2*sqrt(2)*cos(lat)*sin(lon*0.5) / sqrt(1+cos(lat)*cos(lon*0.5));
    *Y = sqrt(2)*sin(lat) / sqrt(1+cos(lat)*cos(lon*0.5));
    return 1;
}

/* sinusoidal.lua (forward only) */
static int fwd_sinusoidal(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon*cos(lat);
    *Y = lat;
    return 1;
}

/* winkel1.lua (forward only) */
static int fwd_winkel1(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon * (2/M_PI + cos(lat))/2;
    *Y = lat;
    return 1;
}

/* eckert1.lua (forward only) */
static int fwd_eckert1(double x, double y, double z, double *X, double *Y)
{
    double FC = 0.92131773192356127802;
    double RP = 0.31830988618379067154;
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = FC * lon * (1 - RP * fabs(lat));
    *Y = FC * lat;
    return 1;
}

/* eckert5.lua (forward only) */
static int fwd_eckert5(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon * (1 + cos(lat))/2;
    *Y = lat;
    return 1;
}

/* winkel2.lua (forward only) */
static int fwd_winkel2(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon/2*(2/M_PI + sqrt(M_PI*M_PI - 4*lat*lat)/M_PI);
    *Y = lat;
    return 1;
}

/* kavrayskiy7.lua (forward only) */
static int fwd_kavrayskiy7(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = 3*lon/(2*M_PI)*sqrt(M_PI*M_PI/3 - lat*lat);
    *Y = lat;
    return 1;
}

/* wagner6.lua (forward only) */
static int fwd_wagner6(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon*sqrt(1-3*lat*lat/(M_PI*M_PI));
    *Y = lat;
    return 1;
}

/* larrivee.lua (forward only) */
static int fwd_larrivee(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = (0.5 + 0.5*sqrt(cos(lat)))*lon;
    *Y = lat / (cos(lat/2)*cos(lon/6));
    return 1;
}

/* gins8.lua (forward only) */
static int fwd_gins8(double x, double y, double z, double *X, double *Y)
{
    double Cl = 0.000952426;
    double Cp = 0.162388;
    double C12 = 0.08333333333333333;
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double t = lat*lat;
    double Y_ = lat * (1 + t*C12);
    double X_ = lon * (1 - Cp*t);
    t = lon*lon;
    X_ = X_ * (0.87 - Cl * t*t);
    *X = X_; *Y = Y_;
    return 1;
}

/* polyconic.lua (forward only) */
static int fwd_polyconic(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    if (lat == 0) { *X = lon; *Y = 0; return 1; }
    *X = 1/tan(lat)*sin(lon*sin(lat));
    *Y = lat + 1/tan(lat)*(1 - cos(lon*sin(lat)));
    return 1;
}

typedef int (*inverse_fn)(double, double, double *, double *, double *);
typedef int (*forward_fn)(double, double, double, double *, double *);

/* metadata exactly as LUA_load_lens would read the script globals
 * (fisheye.c:1683-1749): map preference inverse-first, absent
 * lens_width/height = 0, max_fov/max_vfov truncated to int */
struct lens_script {
    const char *name;
    inverse_fn inv;
    forward_fn fwd;
    int max_fov, max_vfov;
    double lens_width, lens_height;
};

static struct lens_script LENSES[] = {
    {"panini",        inv_panini,        fwd_panini,        360, 180, 0, 0},
    {"stereographic", inv_stereographic, fwd_stereographic, 360, 360, 0, 0},
    {"rectilinear",   inv_rectilinear,   fwd_rectilinear,   180, 180, 0, 0},
    {"fisheye1",      inv_fisheye1,      fwd_fisheye1,      360, 360, 0, 0},
    {"equirect",      inv_equirect,      fwd_equirect,      360, 180, 0, 0},
    {"mercator",      inv_mercator,      fwd_mercator,      360, 180, 0, 0},
    {"hammer",        inv_hammer,        fwd_hammer,        360, 180, 0, 0},
    {"sinusoidal",    NULL,              fwd_sinusoidal,    360, 180, 0, 0},
    {"winkel1",       NULL,              fwd_winkel1,       360, 180, 0, 0},
    {"eckert1",       NULL,              fwd_eckert1,       360, 180, 0, 0},
    {"eckert5",       NULL,              fwd_eckert5,       360, 180, 0, 0},
    {"winkel2",       NULL,              fwd_winkel2,       360, 180, 0, 0},
    {"kavrayskiy7",   NULL,              fwd_kavrayskiy7,   360, 180, 0, 0},
    {"wagner6",       NULL,              fwd_wagner6,       360, 180, 0, 0},
    {"larrivee",      NULL,              fwd_larrivee,      360, 180, 0, 0},
    {"gins8",         NULL,              fwd_gins8,         360, 180, 0, 0},
    {"polyconic",     NULL,              fwd_polyconic,     360, 180, 0, 0},
};

/* lens_width/lens_height globals are load-time Lua expressions; compute
 * them in double at startup exactly as the scripts do */
static void init_lens_metadata(void)
{
    for (unsigned i = 0; i < sizeof(LENSES)/sizeof(LENSES[0]); ++i) {
        struct lens_script *L = &LENSES[i];
        if (!strcmp(L->name, "fisheye1")) { L->lens_width = 2*M_PI; L->lens_height = 2*M_PI; }
        else if (!strcmp(L->name, "equirect")) { L->lens_width = 2*M_PI; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "mercator")) { L->lens_width = 2*M_PI; }
        else if (!strcmp(L->name, "hammer")) { L->lens_width = 2*sqrt(2)*2; L->lens_height = sqrt(2)*2; }
        else if (!strcmp(L->name, "sinusoidal")) { L->lens_width = 2*M_PI; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "winkel1")) { L->lens_width = M_PI * (2/M_PI + 1)/2 * 2; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "eckert1")) {
            double FC = 0.92131773192356127802;
            L->lens_width = FC * M_PI * 2; L->lens_height = FC * M_PI;
        }
        else if (!strcmp(L->name, "eckert5")) { L->lens_width = M_PI*2; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "winkel2")) { L->lens_width = M_PI/2*(2/M_PI+1)*2; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "kavrayskiy7")) { L->lens_width = 3*M_PI/(2*M_PI)*sqrt(M_PI*M_PI/3)*2; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "wagner6")) { L->lens_width = M_PI*2; L->lens_height = M_PI; }
        else if (!strcmp(L->name, "larrivee")) { L->lens_width = 2*M_PI; L->lens_height = M_PI/2 / cos(M_PI/2/2) * 2; }
        else if (!strcmp(L->name, "gins8")) {
            /* gins8.lua:21-24 — bounds by forward-mapping the poles
             * through the f32 latlon_to_ray builtin */
            double rx, ry, rz, gx, gy;
            lua_latlon_to_ray(0, M_PI, &rx, &ry, &rz);
            fwd_gins8(rx, ry, rz, &gx, &gy);
            L->lens_width = 2*fabs(gx);
            lua_latlon_to_ray(M_PI/2, 0, &rx, &ry, &rz);
            fwd_gins8(rx, ry, rz, &gx, &gy);
            L->lens_height = 2*fabs(gy);
        }
    }
}

static const struct lens_script *cur_lens;

/* ------------------------------------------------------------------ */
/* the Lua->C wrappers (protocol of fisheye.c:1545-1650)               */
/* ------------------------------------------------------------------ */

static int LUAtoC_lens_inverse(double x, double y, vec3_t ray)
{
    double rx, ry, rz;
    if (!cur_lens->inv(x, y, &rx, &ry, &rz))
        return 0;                     /* Lua nil */
    ray[0] = rx;                      /* double -> vec_t truncation, */
    ray[1] = ry;                      /* fisheye.c:1560-1562         */
    ray[2] = rz;
    VectorNormalize(ray);             /* fisheye.c:1563 */
    return 1;
}

static int LUAtoC_lens_forward(vec3_t ray, double *x, double *y)
{
    /* lua_pushnumber(ray[i]): float promoted to double, fisheye.c:1594-1596 */
    return cur_lens->fwd(ray[0], ray[1], ray[2], x, y);
}

/* fast.lua globe_plate (small=0, big=1, big_fov=160) */
static int globe_plate_fast(double x, double y, double z, int *plate)
{
    double big_fov = 160;
    if (z <= 0) return 0;             /* Lua nil */
    double dist = 0.5 / tan(big_fov*M_PI/180/2);
    double size = 2*dist*tan(M_PI/4);
    double u = x/z*dist;
    double v = y/z*dist;
    if (fabs(u) < size/2 && fabs(v) < size/2) *plate = 0;
    else *plate = 1;
    return 1;
}

static int (*cur_globe_plate)(double, double, double, int *);

static int LUAtoC_globe_plate(vec3_t ray, int *plate)
{
    /* lua_pushnumber(ray[i]) promotions, fisheye.c:1637-1639 */
    return cur_globe_plate(ray[0], ray[1], ray[2], plate);
}

/* ------------------------------------------------------------------ */
/* globe scripts (plate tables computed in double as Lua would, then    */
/* loaded through the LUA_load_globe math: vec3_t stores, CrossProduct  */
/* orthonormalization, fov/dist conversion — fisheye.c:1786-1869)       */
/* ------------------------------------------------------------------ */

struct globe_script {
    const char *name;
    int numplates;
    double fwd[MAX_PLATES][3], up[MAX_PLATES][3], fovdeg[MAX_PLATES];
    int (*plate_fn)(double, double, double, int *);
};

static int build_globe_scripts(struct globe_script *out)
{
    int n = 0;
    /* cube.lua */
    {
        struct globe_script g = { "cube", 6, {
            {0,0,1},{1,0,0},{-1,0,0},{0,0,-1},{0,1,0},{0,-1,0} }, {
            {0,1,0},{0,1,0},{0,1,0},{0,1,0},{0,0,-1},{0,0,1} },
            {90,90,90,90,90,90}, NULL };
        out[n++] = g;
    }
    /* trism.lua */
    {
        struct globe_script g = { "trism", 5, {
            {-cos(M_PI/6),0,sin(M_PI/6)}, {cos(M_PI/6),0,sin(M_PI/6)},
            {0,0,-1}, {0,1,0}, {0,-1,0} }, {
            {0,1,0},{0,1,0},{0,1,0},{0,0,-1},{0,0,-1} },
            {120,120,120,128,128}, NULL };
        out[n++] = g;
    }
    /* tetra.lua — the load-time computation, kept in script order */
    {
        double tau = 2*M_PI;
        double d120 = tau/3;
        double d60 = d120 / 2;
        double r = 1;
        double s = 2*r*sin(d60);
        double h = sqrt(s*s-r*r);
        double theta = acos(r/s);
        double c = s/2/sin(theta);
        double d = s/2/tan(theta); (void)d;
        double e = r*cos(d60);
        double f = h-c;
        double fovr = 2*atan(r/f);
        double fovd = fovr * 180 / M_PI + 1;
        double y = e - e*e/(r+e);
        double z = -f + h*e/(r+e);
        struct globe_script g = { "tetra", 4, {
            {0, -y/f, z/f},
            {y/f*sin(d120), -y/f*cos(d120), z/f},
            {y/f*sin(-d120), -y/f*cos(-d120), z/f},
            {0,0,-1} }, {
            {0, -(e-y)/e, (-f-z)/e},
            {(e-y)/e*sin(d120), -(e-y)/e*cos(d120), (-f-z)/e},
            {(e-y)/e*sin(-d120), -(e-y)/e*cos(-d120), (-f-z)/e},
            {0,-1,0} },
            {fovd, fovd, fovd, fovd}, NULL };
        out[n++] = g;
    }
    /* fast.lua */
    {
        struct globe_script g = { "fast", 2, {
            {0,0,1},{0,0,1} }, {
            {0,1,0},{0,1,0} },
            {90,160}, globe_plate_fast };
        out[n++] = g;
    }
    return n;
}

/* LUA_load_globe's plate math, fisheye.c:1830-1869 */
static void load_globe(const struct globe_script *g)
{
    int i, j;
    globe.numplates = g->numplates;
    for (i = 0; i < g->numplates; ++i) {
        for (j = 0; j < 3; ++j) {
            globe.plates[i].forward[j] = g->fwd[i][j];  /* double -> vec_t */
            globe.plates[i].up[j] = g->up[i][j];
        }
        CrossProduct(globe.plates[i].up, globe.plates[i].forward, globe.plates[i].right);
        CrossProduct(globe.plates[i].forward, globe.plates[i].right, globe.plates[i].up);
        globe.plates[i].fov = g->fovdeg[i] * M_PI / 180;
        globe.plates[i].dist = 0.5/tan(globe.plates[i].fov/2);
        globe.plates[i].display = 0;
    }
    cur_globe_plate = g->plate_fn;
    lua_refs.globe_plate = g->plate_fn ? 1 : -1;
    globe.valid = true;
}

/* ------------------------------------------------------------------ */
/* driver                                                              */
/* ------------------------------------------------------------------ */

static const struct lens_script *find_lens(const char *name)
{
    for (unsigned i = 0; i < sizeof(LENSES)/sizeof(LENSES[0]); ++i)
        if (!strcmp(LENSES[i].name, name)) return &LENSES[i];
    fprintf(stderr, "unknown lens %s\n", name);
    exit(2);
}

static void find_and_load_globe(const char *name)
{
    struct globe_script gs[8];
    int n = build_globe_scripts(gs);
    for (int i = 0; i < n; ++i)
        if (!strcmp(gs[i].name, name)) { load_globe(&gs[i]); return; }
    fprintf(stderr, "unknown globe %s\n", name);
    exit(2);
}

/* LUA_load_lens's metadata reads, fisheye.c:1683-1749 */
static void load_lens(const char *name)
{
    cur_lens = find_lens(name);
    lens.map_type = cur_lens->inv ? MAP_INVERSE : MAP_FORWARD;
    lua_refs.lens_inverse = cur_lens->inv ? 1 : -1;
    lua_refs.lens_forward = cur_lens->fwd ? 1 : -1;
    zoom.max_fov = cur_lens->max_fov;
    zoom.max_vfov = cur_lens->max_vfov;
    lens.width = cur_lens->lens_width;
    lens.height = cur_lens->lens_height;
    lens.valid = true;
}

static void alloc_buffers(void)
{
    /* F_RenderView's allocation + rebuild reset, fisheye.c:714-732 */
    int area = lens.width_px * lens.height_px;
    globe.pixels = malloc(globe.platesize*globe.platesize*MAX_PLATES);
    lens.pixels = malloc(area*sizeof(byte*));
    lens.pixel_tints = malloc(area);
    memset(lens.pixels, 0, area*sizeof(byte*));
    memset(lens.pixel_tints, 255, area);
    memset(globe.pixels, 0, globe.platesize*globe.platesize*MAX_PLATES);
}

static void fill_synthetic_plates(void)
{
    /* deterministic pattern shared with the Python tests */
    int S = globe.platesize;
    for (int p = 0; p < globe.numplates; ++p)
        for (int yy = 0; yy < S; ++yy)
            for (int xx = 0; xx < S; ++xx)
                *GLOBEPIXEL(p, xx, yy) = (byte)((p*37 + xx*3 + yy*5) & 0xFF);
}

static int zoom_type_from_name(const char *z)
{
    if (!strcmp(z, "fov")) return ZOOM_FOV;
    if (!strcmp(z, "vfov")) return ZOOM_VFOV;
    if (!strcmp(z, "cover")) return ZOOM_COVER;
    if (!strcmp(z, "contain")) return ZOOM_CONTAIN;
    fprintf(stderr, "unknown zoom %s\n", z);
    exit(2);
}

static void write_i32(FILE *f, int v) { fwrite(&v, 4, 1, f); }

static int mode_lensmap(int argc, char **argv)
{
    /* lensmap <lens> <globe> <w> <h> <zoom> <fovdeg> <numcells> <cell> <pad> <out> */
    if (argc != 10) { fprintf(stderr, "bad lensmap args\n"); return 2; }
    const char *out_path = argv[9];
    lens.width_px = atoi(argv[2]);
    lens.height_px = atoi(argv[3]);
    globe.platesize = lens.width_px < lens.height_px ? lens.width_px : lens.height_px;
    find_and_load_globe(argv[1]);
    load_lens(argv[0]);
    zoom.type = zoom_type_from_name(argv[4]);
    zoom.fov = atoi(argv[5]);
    rubix.numcells = atoi(argv[6]);
    rubix.cell_size = atof(argv[7]);
    rubix.pad_size = atof(argv[8]);
    lens_builder.seconds_per_frame = 1e9f;  /* build in one resume */
    alloc_buffers();

    create_lensmap();
    if (lens_builder.working) { fprintf(stderr, "builder did not finish\n"); return 3; }

    int w = lens.width_px, h = lens.height_px, S = globe.platesize;
    FILE *f = fopen(out_path, "wb");
    if (!f) { perror(out_path); return 1; }
    fwrite("LMAP", 4, 1, f);
    write_i32(f, w); write_i32(f, h); write_i32(f, S);
    write_i32(f, globe.numplates);
    write_i32(f, lens.scale > 0 ? 1 : 0);
    fwrite(&lens.scale, 8, 1, f);
    for (int yy = 0; yy < h; ++yy)
        for (int xx = 0; xx < w; ++xx) {
            byte *p = lens.pixels[yy*w + xx];
            int plate = -1, px = 0, py = 0;
            if (p) {
                long off = p - globe.pixels;
                plate = off / (S*S);
                long rem = off % (S*S);
                py = rem / S;
                px = rem % S;
            }
            write_i32(f, plate); write_i32(f, px); write_i32(f, py);
        }
    fwrite(lens.pixel_tints, 1, (size_t)w*h, f);
    for (int i = 0; i < MAX_PLATES; ++i) write_i32(f, globe.plates[i].display);
    fclose(f);
    return 0;
}

static int mode_palmap(int argc, char **argv)
{
    /* palmap <palette_file> <out> */
    if (argc != 2) { fprintf(stderr, "bad palmap args\n"); return 2; }
    static byte pal[768];
    FILE *f = fopen(argv[0], "rb");
    if (!f || fread(pal, 1, 768, f) != 768) { fprintf(stderr, "bad palette\n"); return 1; }
    fclose(f);
    host_basepal = pal;
    create_palmap();
    f = fopen(argv[1], "wb");
    for (int i = 0; i < MAX_PLATES; ++i)
        fwrite(globe.plates[i].palette, 1, 256, f);
    fclose(f);
    return 0;
}

static int mode_pcx(int argc, char **argv)
{
    /* pcx <globe> <platesize> <plate_index> <with_margins> <palette_file> <out> */
    if (argc != 6) { fprintf(stderr, "bad pcx args\n"); return 2; }
    static byte pal[768];
    FILE *f = fopen(argv[4], "rb");
    if (!f || fread(pal, 1, 768, f) != 768) { fprintf(stderr, "bad palette\n"); return 1; }
    fclose(f);
    host_basepal = pal;
    globe.platesize = atoi(argv[1]);
    lens.width_px = lens.height_px = globe.platesize;
    find_and_load_globe(argv[0]);
    alloc_buffers();
    fill_synthetic_plates();
    com_writefile_path = argv[5];
    WritePCXplate("out.pcx", atoi(argv[2]), atoi(argv[3]));
    return 0;
}

static int mode_probes(int argc, char **argv)
{
    /* probes <globe> <out>
     * dumps, for each plate and a 17x17 uv grid:
     *   plate_uv_to_ray -> 3 doubles (the float values, promoted)
     *   ray_to_plate_index of that ray -> 1 double
     *   ray_to_plate_uv on that plate -> u, v, valid (3 doubles)
     * then latlon_to_ray over a lat/lon grid -> 3 doubles each. */
    if (argc != 2) { fprintf(stderr, "bad probes args\n"); return 2; }
    globe.platesize = 64;
    lens.width_px = lens.height_px = 64;
    find_and_load_globe(argv[0]);
    FILE *f = fopen(argv[1], "wb");
    const int N = 17;
    for (int p = 0; p < globe.numplates; ++p)
        for (int iv = 0; iv < N; ++iv)
            for (int iu = 0; iu < N; ++iu) {
                double u = (double)iu / (N - 1);
                double v = (double)iv / (N - 1);
                vec3_t ray;
                plate_uv_to_ray(p, u, v, ray);
                double vals[7];
                vals[0] = ray[0]; vals[1] = ray[1]; vals[2] = ray[2];
                vals[3] = ray_to_plate_index(ray);
                double uu, vv;
                qboolean ok = ray_to_plate_uv(p, ray, &uu, &vv);
                vals[4] = uu; vals[5] = vv; vals[6] = ok;
                fwrite(vals, 8, 7, f);
            }
    const int M = 13;
    for (int ila = 0; ila < M; ++ila)
        for (int ilo = 0; ilo < M; ++ilo) {
            double lat = -M_PI/2 + M_PI * ila / (M - 1);
            double lon = -M_PI + 2*M_PI * ilo / (M - 1);
            vec3_t ray;
            latlon_to_ray(lat, lon, ray);
            double lat2, lon2;
            ray_to_latlon(ray, &lat2, &lon2);
            double vals[7] = { lat, lon, ray[0], ray[1], ray[2], lat2, lon2 };
            fwrite(vals, 8, 7, f);
        }
    fclose(f);
    return 0;
}

int main(int argc, char **argv)
{
    init_lens_metadata();
    if (argc < 2) { fprintf(stderr, "usage: harness <mode> ...\n"); return 2; }
    if (!strcmp(argv[1], "lensmap")) return mode_lensmap(argc - 2, argv + 2);
    if (!strcmp(argv[1], "palmap")) return mode_palmap(argc - 2, argv + 2);
    if (!strcmp(argv[1], "pcx")) return mode_pcx(argc - 2, argv + 2);
    if (!strcmp(argv[1], "probes")) return mode_probes(argc - 2, argv + 2);
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
