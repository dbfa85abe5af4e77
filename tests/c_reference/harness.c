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

/* CtoLUA_plate_to_ray (fisheye.c:1521-1537): nil when the plate index is
 * out of range; the vec3_t float pass-through otherwise */
static int lua_plate_to_ray(double plate_index, double u, double v,
                            double *x, double *y, double *z)
{
    int pi_ = (int)plate_index;
    vec3_t ray;
    if (pi_ < 0 || pi_ >= globe.numplates) return 0;
    plate_uv_to_ray(pi_, u, v, ray);
    *x = ray[0]; *y = ray[1]; *z = ray[2];
    return 1;
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

/* fisheye2.lua */
static int inv_fisheye2(double x, double y, double *X, double *Y, double *Z)
{
    double maxr = 2*sin(M_PI*0.5);
    double r = sqrt(x*x+y*y);
    if (r > maxr) return 0;
    double theta = 2*asin(r*0.5);
    double s = sin(theta);
    *X = x/r*s; *Y = y/r*s; *Z = cos(theta);
    return 1;
}
static int fwd_fisheye2(double x, double y, double z, double *X, double *Y)
{
    double theta = acos(z);
    double r = 2*sin(theta*0.5);
    double c = r/sqrt(x*x+y*y);
    *X = x*c; *Y = y*c;
    return 1;
}

/* cylinder.lua */
static int inv_cylinder(double x, double y, double *X, double *Y, double *Z)
{
    if (fabs(x) > M_PI) return 0;
    double lon = x;
    double lat = atan(y);
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_cylinder(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon; *Y = tan(lat);
    return 1;
}

/* miller.lua */
static int inv_miller(double x, double y, double *X, double *Y, double *Z)
{
    double maxy = 1.25*log(tan(0.25*M_PI+0.4*M_PI*0.5));
    if (fabs(y) > maxy || fabs(x) > M_PI) return 0;
    double lon = x;
    double lat = 5.0/4*atan(sinh(4.0/5*y));
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_miller(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = lon;
    *Y = 1.25*log(tan(0.25*M_PI+0.4*lat));
    return 1;
}

/* gumby.lua (panini scaled by 0.75) */
static int inv_gumby(double x, double y, double *X, double *Y, double *Z)
{
    double d = 1, gumbyScaleInv = 1.0/0.75;
    double k = x*x/((d+1)*(d+1));
    double dscr = k*k*d*d - (k+1)*(k*d*d-1);
    double clon = (-k*d+sqrt(dscr))/(k+1);
    double S = (d+1)/(d+clon);
    double lon = atan2(x,S*clon);
    double lat = atan2(y,S);
    lon = lon*gumbyScaleInv;
    lat = lat*gumbyScaleInv;
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_gumby(double x, double y, double z, double *X, double *Y)
{
    double d = 1, gumbyScale = 0.75, lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    lon = lon*gumbyScale;
    lat = lat*gumbyScale;
    double S = (d+1)/(d+cos(lon));
    *X = S*sin(lon);
    *Y = S*tan(lat);
    return 1;
}

/* fahey.lua (note: lens_inverse reassigns its y parameter; kept) */
static int inv_fahey(double x, double y, double *X, double *Y, double *Z)
{
    double XR = 0.819152 * M_PI, YR = 1.819152;
    if (x*x/(XR*XR) + y*y/(YR*YR) >= 1) return 0;
    y = y / 1.819152;
    double lat = 2 * atan(y);
    y = 1 - y*y;
    double lon = x / (0.819152 * sqrt(y));
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_fahey(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double fx = tan(0.5 * lat);
    double fy = 1.819152 * fx;
    fx = 0.819152 * lon * sqrt(1-fx*fx);
    *X = fx; *Y = fy;
    return 1;
}

/* gallstereo.lua (its forward checks the RAY components against the
 * plane bounds — a script quirk kept as written; it never fires since
 * |ray| <= 1 < maxx) */
static int inv_gallstereo(double x, double y, double *X, double *Y, double *Z)
{
    double RYF = 0.58578643762690495119, RXF = 1.41421356237309504880;
    double lon = RXF * x;
    double lat = 2 * atan(y * RYF);
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_gallstereo(double x, double y, double z, double *X, double *Y)
{
    double YF = 1.70710678118654752440, XF = 0.70710678118654752440;
    double maxx = XF * M_PI, maxy = YF * tan(0.5*M_PI/2);
    if (fabs(x) > maxx || fabs(y) > maxy) return 0;
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    *X = XF * lon;
    *Y = YF * tan(0.5 * lat);
    return 1;
}

/* cube.lua — unfolded cross; inverse returns the ray directly */
static void cube_col(double x, double *i, double *f)
{
    double cols = 4;
    double nx = x+cols/2;
    double fi;
    double ff = modf(nx, &fi);
    if (nx < 0) { fi = fi-1; ff = ff+1; }
    *i = fi; *f = ff;
}
static void cube_row(double y, double *i, double *f)
{
    double rows = 3;
    double ny = -y+rows/2;
    double fi;
    double ff = modf(ny, &fi);
    if (ny < 0) { fi = fi-1; ff = ff+1; }
    *i = fi; *f = ff;
}
static int inv_cube(double x, double y, double *X, double *Y, double *Z)
{
    double rows = 3, cols = 4;
    x = x - 0.5;
    double r, v, c, u;
    cube_row(y, &r, &v);
    cube_col(x, &c, &u);
    u = u - 0.5;
    v = v - 0.5;
    v = -v;
    if (r < 0 || r >= rows || c < -1 || c >= cols) return 0;
    if (r == 0 || r == 2) {
        if (!(c == 1)) return 0;
    }
    if (r == 0)      { *X = u;    *Y = 0.5;  *Z = -v;   return 1; }  /* top */
    else if (r == 2) { *X = u;    *Y = -0.5; *Z = v;    return 1; }  /* bottom */
    else if (c == 0) { *X = -0.5; *Y = v;    *Z = u;    return 1; }  /* left */
    else if (c == 1) { *X = u;    *Y = v;    *Z = 0.5;  return 1; }  /* front */
    else if (c == 2) { *X = 0.5;  *Y = v;    *Z = -u;   return 1; }  /* right */
    else if (c == 3 || c == -1) { *X = -u; *Y = v; *Z = -0.5; return 1; } /* back */
    return 0;
}
static int fwd_cube(double x, double y, double z, double *X, double *Y)
{
    double ax = fabs(x), ay = fabs(y), az = fabs(z);
    double max = ax;                 /* math.max: strict > replaces */
    if (ay > max) max = ay;
    if (az > max) max = az;
    double u, v;
    if (max == ax) {
        if (x > 0) { u = -z/x*0.5; v = y/x*0.5; *X = 1+u; *Y = v; return 1; }
        else       { u = z/-x*0.5; v = y/-x*0.5; *X = -1+u; *Y = v; return 1; }
    } else if (max == ay) {
        if (y > 0) { u = x/y*0.5; v = -z/y*0.5; *X = u; *Y = 1+v; return 1; }
        else       { u = x/-y*0.5; v = z/-y*0.5; *X = u; *Y = -1+v; return 1; }
    } else if (max == az) {
        if (z > 0) { u = x/z*0.5; v = y/z*0.5; *X = u; *Y = v; return 1; }
        else {
            u = -x/-z*0.5; v = y/-z*0.5;
            if (u > 0) { *X = -2+u; *Y = v; } else { *X = 2+u; *Y = v; }
            return 1;
        }
    }
    return 0;  /* unreachable (Lua would return no values) */
}

/* cubestereo.lua */
static void cubestereo_projectcube(double x, double y, double z,
                                   double *px, double *py, double *pz)
{
    double magx = fabs(x), magy = fabs(y), magz = fabs(z);
    double mag = magz;
    if (magx >= magy && magx >= magz) mag = magx;
    else if (magy >= magx && magy >= magz) mag = magy;
    *px = x / mag; *py = y / mag; *pz = z / mag;
}
static int inv_cubestereo(double x, double y, double *X, double *Y, double *Z)
{
    double rx, ry, rz;
    double magx = fabs(x), magy = fabs(y);
    double z = 2;
    if (magx <= 1 && magy <= 1) { rx = x; ry = y; rz = z-1; }
    else if (magx > magy) { rx = x / magx; ry = y / magx; rz = z / magx-1; }
    else { rx = x / magy; ry = y / magy; rz = z / magy-1; }
    double len = sqrt(rx*rx+ry*ry+rz*rz);
    *X = rx/len; *Y = ry/len; *Z = rz/len;
    return 1;
}
static int fwd_cubestereo(double x, double y, double z, double *X, double *Y)
{
    double px, py, pz;
    cubestereo_projectcube(x, y, z, &px, &py, &pz);
    *X = px/(pz+1)*2; *Y = py/(pz+1)*2;
    return 1;
}

/* mollweide.lua */
static double mollweide_solveTheta(double lat)
{
    double t = lat, dt;
    do {
        dt = -(t + sin(t) - M_PI*sin(lat))/(1+cos(t));
        t = t+dt;
    } while (!(dt < 0.001));
    return t/2;
}
static int inv_mollweide(double x, double y, double *X, double *Y, double *Z)
{
    double root2 = sqrt(2);
    if (x*x/8 + y*y/2 > 1) return 0;
    double t = asin(y/root2);
    double lon = M_PI*x/(2*root2*cos(t));
    double lat = asin((2*t+sin(2*t))/M_PI);
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_mollweide(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double t = mollweide_solveTheta(lat);
    *X = 2*sqrt(2)/M_PI*lon*cos(t);
    *Y = sqrt(2)*sin(t);
    return 1;
}

/* eckert4.lua — fixed 20-iteration Newton; get_max_x memoizes on the
 * previous y (a Lua global, cleared between loads -> reset in load_lens) */
static double eckert4_solveTheta(double lat)
{
    double t = lat/2, dt = 0;
    for (int i = 1; i <= 20; ++i) {
        dt = -(t + sin(t)*cos(t) + 2*sin(t) - (2+M_PI*0.5)*sin(lat))
             /(2*cos(t)*(1+cos(t)));
        t = t+dt;
    }
    return t;
}
static double e4_maxy;          /* load-time global */
static double e4_lasty, e4_maxx;
static int e4_has_lasty;
static double eckert4_get_max_x(double y, double lat)
{
    if (!e4_has_lasty || y != e4_lasty) {
        double t = eckert4_solveTheta(fabs(lat));
        e4_maxx = 2/sqrt(M_PI*(4+M_PI))*M_PI*(1+cos(t));
        e4_lasty = y;
        e4_has_lasty = 1;
    }
    return e4_maxx;
}
static int inv_eckert4(double x, double y, double *X, double *Y, double *Z)
{
    double t = asin(y/2*sqrt((4+M_PI)/M_PI));
    double lat = asin((t+sin(t)*cos(t)+2*sin(t))/(2+M_PI*0.5));
    double lon = sqrt(M_PI*(4+M_PI))*x/(2*(1+cos(t)));
    if (fabs(y) > e4_maxy || fabs(x) > eckert4_get_max_x(y,lat)) return 0;
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}
static int fwd_eckert4(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double t = eckert4_solveTheta(lat);
    *X = 2/sqrt(M_PI*(4+M_PI))*lon*(1+cos(t));
    *Y = 2*sqrt(M_PI/(4+M_PI))*sin(t);
    return 1;
}

/* winkeltripel.lua — 25-iter 2-D Newton (d3 winkel3.js port) with the
 * manual corner-artifact mask; bounds are load-time globals */
static double wt_width, wt_height, wt_artifact_x, wt_artifact_y;
static int fwd_winkeltripel(double x, double y, double z, double *X, double *Y)
{
    double clat0 = 2/M_PI;
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    double clat = cos(lat);
    double temp = clat*cos(lon*0.5);
    double D = acos(temp);
    double C = 1 - temp*temp;
    temp = D/sqrt(C);
    *X = 0.5 * (2*temp*clat*sin(lon*0.5)+lon*clat0);
    *Y = 0.5 * (temp*sin(lat) + lat);
    return 1;
}
static int inv_winkeltripel(double x, double y, double *X, double *Y, double *Z)
{
    if (fabs(y) >= wt_height/2) return 0;
    if (fabs(x) > wt_artifact_x && fabs(y) > wt_artifact_y) return 0;
    double lambda = x, phi = y;
    double eps = 0.0001, halfpi = M_PI/2;
    for (int iter = 1; iter <= 25; ++iter) {
        double cosphi = cos(phi);
        double sinphi = sin(phi);
        double sin_2phi = sin(2 * phi);
        double sin2phi = sinphi * sinphi;
        double cos2phi = cosphi * cosphi;
        double sinlambda = sin(lambda);
        double coslambda_2 = cos(lambda / 2);
        double sinlambda_2 = sin(lambda / 2);
        double sin2lambda_2 = sinlambda_2 * sinlambda_2;
        double C = 1 - cos2phi * coslambda_2 * coslambda_2;
        double E, F;
        if (C != 0) {
            F = 1/C;
            E = acos(cosphi * coslambda_2) * sqrt(F);
        } else {
            E = 0; F = 0;
        }
        double fx = .5 * (2 * E * cosphi * sinlambda_2 + lambda / halfpi) - x;
        double fy = .5 * (E * sinphi + phi) - y;
        double sigxsiglambda = .5 * F * (cos2phi * sin2lambda_2 + E * cosphi * coslambda_2 * sin2phi) + .5 / halfpi;
        double sigxsigphi = F * (sinlambda * sin_2phi / 4 - E * sinphi * sinlambda_2);
        double sigysiglambda = .125 * F * (sin_2phi * sinlambda_2 - E * sinphi * cos2phi * sinlambda);
        double sigysigphi = .5 * F * (sin2phi * coslambda_2 + E * sin2lambda_2 * cosphi) + .5;
        double denominator = sigxsigphi * sigysiglambda - sigysigphi * sigxsiglambda;
        double siglambda = (fy * sigxsigphi - fx * sigysigphi) / denominator;
        double sigphi = (fx * sigysiglambda - fy * sigxsiglambda) / denominator;
        lambda = lambda - siglambda;
        phi = phi - sigphi;
        if (fabs(siglambda) < eps && fabs(sigphi) < eps) break;
    }
    double lat = phi, lon = lambda;
    double rx, ry, rz, x0, y0;
    lua_latlon_to_ray(lat, M_PI, &rx, &ry, &rz);
    fwd_winkeltripel(rx, ry, rz, &x0, &y0);
    if (fabs(x) < fabs(x0)) {
        lua_latlon_to_ray(lat, lon, X, Y, Z);
        return 1;
    }
    return 0;
}

/* vandergrinten.lua — cubic-resolvent inverse, TOL-guarded */
static double vdg_maxr;         /* load-time global */
static int fwd_vandergrinten(double x, double y, double z, double *X, double *Y)
{
    double lat, lon;
    lua_ray_to_latlon(x,y,z,&lat,&lon);
    if (lat == 0) { *X = lon; *Y = 0; return 1; }
    double t = asin(fabs(2*lat/M_PI));
    if (fabs(lat) == M_PI/2) {
        double y2 = M_PI*tan(t/2);
        if (y2*lat < 0) y2 = -y2;
        *X = 0; *Y = y2;
        return 1;
    }
    double a = 0.5*fabs(M_PI/lon - lon/M_PI);
    double g = cos(t)/(sin(t)+cos(t)-1);
    double p = g*(2/sin(t) - 1);
    double q = a*a+g;
    double fx = M_PI*(a*(g-p*p) + sqrt(a*a*(g-p*p)*(g-p*p)-(p*p+a*a)*(g*g-p*p)))/(p*p+a*a);
    double fy = M_PI*(p*q-a*sqrt((a*a+1)*(p*p+a*a) - q*q))/(p*p+a*a);
    if (lon*fx < 0) fx = -fx;
    if (lat*fy < 0) fy = -fy;
    *X = fx; *Y = fy;
    return 1;
}
static int inv_vandergrinten(double x, double y, double *X, double *Y, double *Z)
{
    double TOL = 1.e-10;
    double THIRD = .33333333333333333333;
    double C2_27 = .07407407407407407407;
    double PI4_3 = 4.18879020478639098458;
    double PISQ = 9.86960440108935861869;
    double TPISQ = 19.73920880217871723738;
    double HPISQ = 4.93480220054467930934;
    if (x*x+y*y > vdg_maxr*vdg_maxr) return 0;
    double lat, lon;
    double t, c0, c1, c2, c3, al, r2, r, m, d, ay, x2, y2;
    x2 = x*x;
    ay = fabs(y);
    if (ay < TOL) {
        lat = 0;
        t = x2*x2 + TPISQ * (x2 + HPISQ);
        if (fabs(x) <= TOL) lon = 0;
        else lon = 0.5 * (x2 - PISQ + sqrt(t)) / x;
        lua_latlon_to_ray(lat,lon,X,Y,Z);
        return 1;
    }
    y2 = y*y;
    r = x2+y2;
    r2 = r*r;
    c1 = -M_PI*ay*(r+PISQ);
    c3 = r2 + (2*M_PI)*(ay*r+M_PI*(y2+M_PI*(ay+M_PI/2)));
    c2 = c1 + PISQ * (r-3*y2);
    c0 = M_PI*ay;
    c2 = c2/c3;
    al = c1 / c3 - THIRD * c2*c2;
    m = 2 *sqrt(-THIRD*al);
    d = C2_27*c2*c2*c2+(c0*c0-THIRD*c2*c1)/c3;
    d = 3*d/(al*m);
    t = fabs(d);
    if (t - TOL <= 1) {
        if (t > 1) {
            if (d > 0) d = 0;
            else d = M_PI;
        } else {
            d = acos(d);
        }
        lat = M_PI * (m*cos(d*THIRD+PI4_3) - THIRD*c2);
        if (y < 0) lat = -lat;
        t = r2 + TPISQ * (x2-y2+HPISQ);
        if (fabs(x) <= TOL) lon = 0;
        else {
            if (t <= 0) lon = 0.5 * (r - PISQ) / x;
            else lon = 0.5 * (r - PISQ + sqrt(t)) / x;
        }
    } else {
        return 0;
    }
    lua_latlon_to_ray(lat,lon,X,Y,Z);
    return 1;
}

/* quincuncial.lua — Peirce quincuncial via the d3 ellipj port +
 * cnrectify (Fong & Vogel) + the 5-region square rotation.  Lua's ^ is
 * pow(); kept where the script uses it */
static double q_asqrt(double x) { return x > 0 ? sqrt(x) : 0; }
static void q_ellipj(double u, double m, double *sn, double *cn, double *dn,
                     double *ph)
{
    double eps = 0.0001, halfpi = M_PI/2;
    double ai, b, phi, t, twon;
    if (m < eps) {
        t = sin(u);
        b = cos(u);
        ai = .25 * m * (u - t * b);
        *sn = t - ai * b;
        *cn = b + ai * t;
        *dn = 1 - .5 * m * t * t;
        *ph = u - ai;
        return;
    }
    if (m >= 1 - eps) {
        ai = .25 * (1 - m);
        b = cosh(u);
        t = tanh(u);
        phi = 1 / b;
        twon = b * sinh(u);
        *sn = t + ai * (twon - u) / (b * b);
        *cn = phi - ai * t * phi * (twon - u);
        *dn = phi + ai * t * phi * (twon + u);
        *ph = 2 * atan(exp(u)) - halfpi + ai * (twon - u) / b;
        return;
    }
    double a[10], c[10];
    a[1] = 1; c[1] = sqrt(m);
    int i = 1;
    b = sqrt(1 - m);
    twon = 1;
    while (fabs(c[i] / a[i]) > eps && i < 9) {
        ai = a[i];
        i = i+1;
        c[i] = .5 * (ai - b);
        a[i] = .5 * (ai + b);
        b = q_asqrt(ai * b);
        twon = twon*2;
    }
    phi = twon * a[i] * u;
    do {
        b = phi;
        t = c[i] * sin(b) / a[i];
        phi = .5 * (asin(t) + phi);
        i = i-1;
    } while (!(i == 1));
    t = cos(phi);
    *sn = sin(phi);
    *cn = t;
    *dn = t / cos(phi - b);
    *ph = phi;
}
static void q_cnrectify(double x, double y, double *latp, double *longd)
{
    double eps = 0.0001, halfpi = M_PI/2;
    double sqrt2 = sqrt(2), sqrt22 = sqrt(2)/2;
    double m = 1.0/2;
    double ke = 1.85407467730137;
    double xpr = ke*(sqrt22*x-sqrt22*y)/sqrt2+ke;
    double ypr = ke*(sqrt22*x+sqrt22*y)/sqrt2;
    double x1, y1;
    if (fabs(ypr) < eps) {
        double sni, cni, dni, phi_;
        q_ellipj(xpr, m, &sni, &cni, &dni, &phi_);
        x1 = cni;
        y1 = 0.0;
    } else {
        double phi = xpr, psi = ypr;
        double s, c, d, ph1, s1, c1, d1, ph2;
        q_ellipj(phi, m, &s, &c, &d, &ph1);
        q_ellipj(psi, 1-m, &s1, &c1, &d1, &ph2);
        double delta = pow(c1,2) + m*pow(s,2)*pow(s1,2);
        x1 = (c*c1)/delta;
        y1 = -(s*d*s1*d1)/delta;
    }
    *longd = atan2(y1,x1);
    *latp = 2*atan2(sqrt(x1*x1+y1*y1),1)-halfpi;
}
static void q_rotate(double a, double b, double angle, double *a0, double *b0)
{
    double c = cos(angle), s = sin(angle);
    *a0 = a*c - b*s;
    *b0 = a*s + b*c;
}
static int q_inverse_intermediate(double x, double y,
                                  double *X, double *Y, double *Z)
{
    if (fabs(x) > 2 || fabs(y) > 1) return 0;
    x = x+1;
    double lat, lon;
    q_cnrectify(x, y, &lat, &lon);
    double x0, y0, z0;
    lua_latlon_to_ray(lat, -lon, &x0, &y0, &z0);
    /* rotate from south pole to origin */
    *X = x0; *Y = z0; *Z = -y0;
    return 1;
}
static int inv_quincuncial(double x, double y, double *X, double *Y, double *Z)
{
    double sqrt2 = sqrt(2);
    if (fabs(x) > sqrt2 || fabs(y) > sqrt2) return 0;
    double x0, y0;
    if (fabs(x)+fabs(y) < sqrt2) {          /* front */
        q_rotate(x, y, M_PI/4, &x0, &y0);
        x0 = x0-1;
    } else if (x > 0 && y < 0) {            /* lower right */
        q_rotate(x, y, M_PI/4, &x0, &y0);
        x0 = x0-1;
    } else if (x < 0 && y > 0) {            /* upper left */
        q_rotate(x, y, M_PI/4, &x0, &y0);
        x0 = x0+3;
    } else if (x < 0 && y < 0) {            /* lower left */
        q_rotate(x, y, M_PI/4+M_PI, &x0, &y0);
        x0 = x0+1; y0 = y0-2;
    } else {                                /* upper right */
        q_rotate(x, y, M_PI/4+M_PI, &x0, &y0);
        x0 = x0+1; y0 = y0+2;
    }
    return q_inverse_intermediate(x0, y0, X, Y, Z);
}

/* debug.lua — plate table layout from numplates; metadata and layout
 * are computed in load_lens (the reference re-executes the script per
 * rebuild because they depend on the globe, fisheye.c:734-737) */
static double dbg_rows, dbg_cols[2];
static int dbg_col(double rowcols, double x, double *i, double *f)
{
    double nx = x+rowcols/2;
    double fi;
    double ff = modf(nx, &fi);
    if (nx < 0 || nx >= rowcols) return 0;   /* nil, nil */
    *i = fi; *f = ff;
    return 1;
}
static int dbg_row(double y, double *i, double *f)
{
    double ny = -y+dbg_rows/2;
    double fi;
    double ff = modf(ny, &fi);
    if (ny < 0 || ny >= dbg_rows) return 0;
    *i = fi; *f = ff;
    return 1;
}
static int inv_debug(double x, double y, double *X, double *Y, double *Z)
{
    double r, v, c, u;
    if (!dbg_row(y, &r, &v)) return 0;
    if (!dbg_col(dbg_cols[(int)r], x, &c, &u)) return 0;
    double plate = c;
    double i = 0;
    while (i < r) {
        plate = plate + dbg_cols[(int)i];
        i = i + 1;
    }
    return lua_plate_to_ray(plate, u, v, X, Y, Z);
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
    {"fisheye2",      inv_fisheye2,      fwd_fisheye2,      360, 360, 0, 0},
    {"cylinder",      inv_cylinder,      fwd_cylinder,      360, 180, 0, 0},
    {"miller",        inv_miller,        fwd_miller,        360, 180, 0, 0},
    {"gumby",         inv_gumby,         fwd_gumby,         360, 180, 0, 0},
    {"fahey",         inv_fahey,         fwd_fahey,         360, 180, 0, 0},
    {"gallstereo",    inv_gallstereo,    fwd_gallstereo,    360, 180, 0, 0},
    {"cube",          inv_cube,          fwd_cube,          360, 180, 0, 0},
    {"cubestereo",    inv_cubestereo,    fwd_cubestereo,    270, 270, 0, 0},
    {"mollweide",     inv_mollweide,     fwd_mollweide,     360, 180, 0, 0},
    {"eckert4",       inv_eckert4,       fwd_eckert4,       360, 180, 0, 0},
    {"winkeltripel",  inv_winkeltripel,  fwd_winkeltripel,  360, 180, 0, 0},
    {"vandergrinten", inv_vandergrinten, fwd_vandergrinten, 360, 180, 0, 0},
    {"quincuncial",   inv_quincuncial,   NULL,              0,   0,   0, 0},
    {"debug",         inv_debug,         NULL,              0,   0,   0, 0},
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
        else if (!strcmp(L->name, "fisheye2")) {
            double maxr = 2*sin(M_PI*0.5);
            L->lens_width = maxr*2; L->lens_height = maxr*2;
        }
        else if (!strcmp(L->name, "cylinder")) { L->lens_width = 2*M_PI; }
        else if (!strcmp(L->name, "miller")) {
            double maxy = 1.25*log(tan(0.25*M_PI+0.4*M_PI*0.5));
            L->lens_width = 2*M_PI; L->lens_height = maxy*2;
        }
        else if (!strcmp(L->name, "gumby")) {
            /* gumby.lua tail: bounds by forward-mapping through the
             * f32 builtin */
            double rx, ry, rz, gx, gy;
            lua_latlon_to_ray(M_PI/2, 0, &rx, &ry, &rz);
            fwd_gumby(rx, ry, rz, &gx, &gy);
            L->lens_height = gy*2;
            lua_latlon_to_ray(0, M_PI, &rx, &ry, &rz);
            fwd_gumby(rx, ry, rz, &gx, &gy);
            L->lens_width = gx*2;
        }
        else if (!strcmp(L->name, "fahey")) {
            double XR = 0.819152 * M_PI, YR = 1.819152;
            L->lens_width = XR*2; L->lens_height = YR*2;
        }
        else if (!strcmp(L->name, "gallstereo")) {
            double YF = 1.70710678118654752440, XF = 0.70710678118654752440;
            L->lens_width = XF*M_PI*2; L->lens_height = YF*tan(0.5*M_PI/2)*2;
        }
        else if (!strcmp(L->name, "cube")) {
            L->lens_width = 4; L->lens_height = 3;
        }
        else if (!strcmp(L->name, "mollweide")) {
            L->lens_width = 2*sqrt(2)*2; L->lens_height = sqrt(2)*2;
        }
        else if (!strcmp(L->name, "eckert4")) {
            double t = eckert4_solveTheta(M_PI*0.5);
            e4_maxy = 2*sqrt(M_PI/(4+M_PI))*sin(t);
            t = eckert4_solveTheta(0);
            L->lens_width = 2/sqrt(M_PI*(4+M_PI))*M_PI*(1+cos(t))*2;
            L->lens_height = 2*e4_maxy;
        }
        else if (!strcmp(L->name, "winkeltripel")) {
            double rx, ry, rz, gx, gy;
            lua_latlon_to_ray(M_PI/2, 0, &rx, &ry, &rz);
            fwd_winkeltripel(rx, ry, rz, &gx, &gy);
            wt_height = 2*gy;
            lua_latlon_to_ray(0, M_PI, &rx, &ry, &rz);
            fwd_winkeltripel(rx, ry, rz, &gx, &gy);
            wt_width = 2*gx;
            L->lens_width = wt_width; L->lens_height = wt_height;
            wt_artifact_x = wt_width/2*0.71;
            wt_artifact_y = wt_height/2*0.81;
        }
        else if (!strcmp(L->name, "vandergrinten")) {
            double rx, ry, rz, gy;
            lua_latlon_to_ray(0, M_PI, &rx, &ry, &rz);
            fwd_vandergrinten(rx, ry, rz, &vdg_maxr, &gy);
            L->lens_width = 2*vdg_maxr; L->lens_height = 2*vdg_maxr;
        }
        else if (!strcmp(L->name, "quincuncial")) {
            L->lens_width = 2*sqrt(2); L->lens_height = 2*sqrt(2);
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
    e4_has_lasty = 0;  /* LUA_clear_lens wipes script globals between
                        * loads (fisheye.c:1880-1891); eckert4's lasty
                        * memo is one */
    if (!strcmp(name, "debug")) {
        /* debug.lua: layout (and so the metadata) depends on numplates
         * — the reference re-executes the script per rebuild
         * (fisheye.c:734-737); the globe is already loaded here */
        struct lens_script *L = (struct lens_script *)cur_lens;
        int np = globe.numplates;
        if (np == 4) { dbg_rows = 2; dbg_cols[0] = 2; dbg_cols[1] = 2; }
        else if (np == 5) { dbg_rows = 2; dbg_cols[0] = 3; dbg_cols[1] = 2; }
        else if (np == 6) { dbg_rows = 2; dbg_cols[0] = 3; dbg_cols[1] = 3; }
        else { dbg_rows = 1; dbg_cols[0] = np; dbg_cols[1] = 0; }
        double maxcols = dbg_cols[0];
        if (dbg_rows > 1 && dbg_cols[1] > maxcols) maxcols = dbg_cols[1];
        L->lens_width = maxcols;
        L->lens_height = dbg_rows;
    }
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

/* Console tokenizer ground truth (round 3): stdin -> the exact token
 * stream the NQ console produces.  Transliterates Cbuf_Execute's line
 * splitter (common/cmd.c:181-210: '"' counts quotes, unquoted ';'
 * breaks, '\n' breaks regardless) and Cmd_TokenizeString's loop
 * (cmd.c:531-571: skip ws-but-not-newline, COM_Parse per token, 80-arg
 * cap) over the EXTRACTED COM_Parse.  Output: tokens separated by 0x1f,
 * lines by 0x1e. */
static int mode_tokenize(int argc, char **argv)
{
    static char buf[1 << 20];
    char line[1024];
    int n = (int)fread(buf, 1, sizeof(buf) - 1, stdin);
    char *text = buf;
    int remaining = n;
    (void)argc; (void)argv;
    buf[n] = 0;
    while (remaining) {
        int quotes = 0, len;
        int maxlen = remaining < (int)sizeof(line) ? remaining
                                                   : (int)sizeof(line);
        for (len = 0; len < maxlen; len++) {
            if (text[len] == '"')
                quotes++;
            if (!(quotes & 1) && text[len] == ';')
                break;
            if (text[len] == '\n')
                break;
        }
        if (len == sizeof(line))
            len--;
        memcpy(line, text, len);
        line[len] = 0;
        if (len == remaining)
            remaining = 0;
        else {
            len++;
            remaining -= len;
            text += len;
        }
        {
            const char *t = line;
            int argc2 = 0;
            while (1) {
                while (*t && *t <= ' ' && *t != '\n')
                    t++;
                if (*t == '\n') { t++; break; }
                if (!*t)
                    break;
                t = COM_Parse(t);
                if (!t)
                    break;
                if (argc2 < 80) {
                    fwrite(com_token, 1, strlen(com_token), stdout);
                    fputc(0x1f, stdout);
                    argc2++;
                }
            }
        }
        fputc(0x1e, stdout);
    }
    return 0;
}

/* Console numeric parsers: one input token per stdin line -> the
 * extracted Q_atoi and Q_atof results ("%d %.9g"). */
static int mode_num(int argc, char **argv)
{
    char line[2048];
    (void)argc; (void)argv;
    while (fgets(line, sizeof(line), stdin)) {
        size_t n = strlen(line);
        if (n && line[n - 1] == '\n')
            line[n - 1] = 0;
        printf("%d %.17g\n", Q_atoi(line), (double)Q_atof(line));
    }
    return 0;
}

int main(int argc, char **argv)
{
    init_lens_metadata();
    if (argc < 2) { fprintf(stderr, "usage: harness <mode> ...\n"); return 2; }
    if (!strcmp(argv[1], "num")) return mode_num(argc - 2, argv + 2);
    if (!strcmp(argv[1], "tokenize")) return mode_tokenize(argc - 2, argv + 2);
    if (!strcmp(argv[1], "lensmap")) return mode_lensmap(argc - 2, argv + 2);
    if (!strcmp(argv[1], "palmap")) return mode_palmap(argc - 2, argv + 2);
    if (!strcmp(argv[1], "pcx")) return mode_pcx(argc - 2, argv + 2);
    if (!strcmp(argv[1], "probes")) return mode_probes(argc - 2, argv + 2);
    fprintf(stderr, "unknown mode %s\n", argv[1]);
    return 2;
}
