// foamtpu native IO accelerator.
//
// Rebuild of reference: src/OpenFOAM/db/IOstreams/ (the token
// scanner/formatter behind polyMesh + field file IO). The Python
// framework calls these through ctypes (io/native.py); every entry
// point has a pure-Python fallback, so this library is an
// accelerator, not a dependency.
//
// Build: g++ -O3 -shared -fPIC -o libfoamtpu_io.so foamtpu_io.cpp
//
// Format notes (match io/polymesh.py):
//  - list bodies are whitespace/paren separated numbers; '(' and ')'
//    act as separators exactly like the Python parser's replace()
//  - face lists are `n(p0 p1 ... pn-1)` records; parse_faces returns
//    the flat [n0 p... n1 p...] stream split into counts + points

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// Count numeric tokens in buf (first pass, allocation sizing).
long long count_numbers(const char* buf, long long len) {
    long long n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
        char c = *p;
        if (isdigit((unsigned char)c) ||
            ((c == '-' || c == '+' || c == '.') && p + 1 < end &&
             (isdigit((unsigned char)p[1]) || p[1] == '.'))) {
            char* q;
            strtod(p, &q);
            if (q == p) { ++p; continue; }
            ++n;
            p = q;
        } else {
            ++p;
        }
    }
    return n;
}

// Parse up to cap doubles; returns number parsed.
long long parse_doubles(const char* buf, long long len, double* out,
                        long long cap) {
    long long n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end && n < cap) {
        char c = *p;
        if (isdigit((unsigned char)c) ||
            ((c == '-' || c == '+' || c == '.') && p + 1 < end &&
             (isdigit((unsigned char)p[1]) || p[1] == '.'))) {
            char* q;
            double v = strtod(p, &q);
            if (q == p) { ++p; continue; }
            out[n++] = v;
            p = q;
        } else {
            ++p;
        }
    }
    return n;
}

long long parse_longs(const char* buf, long long len, long long* out,
                      long long cap) {
    long long n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end && n < cap) {
        char c = *p;
        if (isdigit((unsigned char)c) ||
            ((c == '-' || c == '+') && p + 1 < end &&
             isdigit((unsigned char)p[1]))) {
            char* q;
            long long v = strtoll(p, &q, 10);
            if (q == p) { ++p; continue; }
            out[n++] = v;
            p = q;
        } else {
            ++p;
        }
    }
    return n;
}

// parse_doubles that also reports the consumed byte offset — used by
// the field-file fast path to cut the big list out of the text before
// handing the remainder to the dictionary parser.
long long parse_doubles_off(const char* buf, long long len,
                            double* out, long long cap,
                            long long* end_off) {
    long long n = 0;
    const char* p = buf;
    const char* end = buf + len;
    while (p < end && n < cap) {
        char c = *p;
        if (isdigit((unsigned char)c) ||
            ((c == '-' || c == '+' || c == '.') && p + 1 < end &&
             (isdigit((unsigned char)p[1]) || p[1] == '.'))) {
            char* q;
            double v = strtod(p, &q);
            if (q == p) { ++p; continue; }
            out[n++] = v;
            p = q;
        } else {
            ++p;
        }
    }
    *end_off = p - buf;
    return n;
}

// Split a parsed [n0 p... n1 p...] label stream into counts + flat
// points. Returns nFaces (or -1 if the stream is inconsistent).
long long split_faces(const long long* nums, long long total,
                      long long* counts, long long* flat,
                      long long* max_pts) {
    long long i = 0, nf = 0, fp = 0, mx = 0;
    while (i < total) {
        long long n = nums[i];
        if (n <= 0 || i + 1 + n > total) return -1;
        counts[nf++] = n;
        if (n > mx) mx = n;
        memcpy(flat + fp, nums + i + 1, (size_t)n * sizeof(long long));
        fp += n;
        i += 1 + n;
    }
    *max_pts = mx;
    return nf;
}

// ---- writers --------------------------------------------------------------

static int write_header_open(FILE** fp, const char* path,
                             const char* header) {
    *fp = fopen(path, "w");
    if (!*fp) return -1;
    fputs(header, *fp);
    return 0;
}

int write_label_list(const char* path, const char* header,
                     const long long* v, long long n) {
    FILE* f;
    if (write_header_open(&f, path, header)) return -1;
    fprintf(f, "%lld\n(\n", n);
    for (long long i = 0; i < n; ++i) fprintf(f, "%lld\n", v[i]);
    fputs(")\n", f);
    return fclose(f);
}

int write_scalar_list(const char* path, const char* header,
                      const double* v, long long n) {
    FILE* f;
    if (write_header_open(&f, path, header)) return -1;
    fprintf(f, "%lld\n(\n", n);
    for (long long i = 0; i < n; ++i) fprintf(f, "%.17g\n", v[i]);
    fputs(")\n", f);
    return fclose(f);
}

int write_vector_list(const char* path, const char* header,
                      const double* v, long long n) {
    FILE* f;
    if (write_header_open(&f, path, header)) return -1;
    fprintf(f, "%lld\n(\n", n);
    for (long long i = 0; i < n; ++i)
        fprintf(f, "(%.17g %.17g %.17g)\n", v[3 * i], v[3 * i + 1],
                v[3 * i + 2]);
    fputs(")\n", f);
    return fclose(f);
}

// faces from a padded [n, max_pts] table (pad = -1)
int write_face_list(const char* path, const char* header,
                    const long long* face_pts,
                    const long long* face_npts, long long n,
                    long long max_pts) {
    FILE* f;
    if (write_header_open(&f, path, header)) return -1;
    fprintf(f, "%lld\n(\n", n);
    for (long long i = 0; i < n; ++i) {
        long long k = face_npts[i];
        fprintf(f, "%lld(", k);
        const long long* row = face_pts + i * max_pts;
        for (long long j = 0; j < k; ++j)
            fprintf(f, j ? " %lld" : "%lld", row[j]);
        fputs(")\n", f);
    }
    fputs(")\n", f);
    return fclose(f);
}

}  // extern "C"

// ---- mesh geometry (reference: src/OpenFOAM/meshes/primitiveMesh/
// primitiveMeshFaceCentresAndAreas.C — fan triangulation about the
// point-average centre; identical formula to mesh/core.py
// face_centres_areas) -------------------------------------------------------

extern "C" void face_geometry(const double* points,
                              const long long* face_pts,
                              const long long* face_npts,
                              long long n_faces, long long max_pts,
                              double* ctr, double* area) {
    for (long long f = 0; f < n_faces; ++f) {
        const long long* fp = face_pts + f * max_pts;
        long long n = face_npts[f];
        double ce[3] = {0, 0, 0};
        for (long long i = 0; i < n; ++i) {
            const double* p = points + 3 * fp[i];
            ce[0] += p[0]; ce[1] += p[1]; ce[2] += p[2];
        }
        ce[0] /= n; ce[1] /= n; ce[2] /= n;
        double sn[3] = {0, 0, 0}, sac[3] = {0, 0, 0}, sa = 0;
        for (long long i = 0; i < n; ++i) {
            const double* pi = points + 3 * fp[i];
            const double* pn = points + 3 * fp[(i + 1) % n];
            double e1[3] = {pn[0] - pi[0], pn[1] - pi[1],
                            pn[2] - pi[2]};
            double e2[3] = {ce[0] - pi[0], ce[1] - pi[1],
                            ce[2] - pi[2]};
            double tn[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                            e1[2] * e2[0] - e1[0] * e2[2],
                            e1[0] * e2[1] - e1[1] * e2[0]};
            double ta = sqrt(tn[0] * tn[0] + tn[1] * tn[1]
                             + tn[2] * tn[2]);
            double tc[3] = {pi[0] + pn[0] + ce[0],
                            pi[1] + pn[1] + ce[1],
                            pi[2] + pn[2] + ce[2]};
            sn[0] += tn[0]; sn[1] += tn[1]; sn[2] += tn[2];
            sa += ta;
            sac[0] += ta * tc[0]; sac[1] += ta * tc[1];
            sac[2] += ta * tc[2];
        }
        double* c = ctr + 3 * f;
        double* a = area + 3 * f;
        if (sa < 1e-30) {
            c[0] = ce[0]; c[1] = ce[1]; c[2] = ce[2];
        } else {
            c[0] = sac[0] / sa / 3.0;
            c[1] = sac[1] / sa / 3.0;
            c[2] = sac[2] / sa / 3.0;
        }
        a[0] = 0.5 * sn[0]; a[1] = 0.5 * sn[1]; a[2] = 0.5 * sn[2];
    }
}
