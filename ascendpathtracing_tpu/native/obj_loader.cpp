// Native Wavefront-OBJ loader — the host data-loader component
// (the reference's ReadFile role, /root/reference/src/data_utils.h:55-92,
// for the mesh pipeline; the Python fallback lives in accel/meshes.py).
//
// Semantics MUST match accel/meshes.load_obj exactly (the test compares
// both parsers on the same files):
//   - `v x y z` records (extra fields ignored)
//   - `f i j k [l ...]` records, fan-triangulated (1,k,k+1)
//   - indices 1-based, or negative = relative to vertices seen SO FAR
//   - `v/vt/vn` tuples: vertex index only
//   - everything else ignored
//
// Two-pass C API (caller allocates):
//   apt_obj_count(path, &n_verts, &n_tris)           -> 0 ok
//   apt_obj_load(path, verts_f64, faces_i64, nv, nt) -> 0 ok
//
// Build: part of libaptnative.so (see Makefile).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Counts {
    long verts = 0;
    long tris = 0;
};

// Returns false on IO error.  When out buffers are non-null, fills them.
bool parse(const char* path, Counts* counts, double* verts,
           long long* faces, long max_verts, long max_tris) {
    FILE* fh = std::fopen(path, "rb");
    if (!fh) return false;
    char line[8192];
    long nv = 0;
    long nt = 0;
    std::vector<long long> idx;
    while (std::fgets(line, sizeof line, fh)) {
        char* s = line;
        while (*s == ' ' || *s == '\t') s++;
        if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
            char* p = s + 2;
            char* end = nullptr;
            double x = std::strtod(p, &end);
            if (end == p) continue;
            p = end;
            double y = std::strtod(p, &end);
            if (end == p) continue;
            p = end;
            double z = std::strtod(p, &end);
            if (end == p) continue;
            if (verts) {
                if (nv >= max_verts) { std::fclose(fh); return false; }
                verts[nv * 3 + 0] = x;
                verts[nv * 3 + 1] = y;
                verts[nv * 3 + 2] = z;
            }
            nv++;
        } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
            idx.clear();
            char* p = s + 1;
            while (*p) {
                while (*p == ' ' || *p == '\t') p++;
                if (*p == '\0' || *p == '\n' || *p == '\r') break;
                char* end = nullptr;
                long long i = std::strtoll(p, &end, 10);
                if (end == p) break;  // malformed token: stop like int() would
                // 1-based, or negative relative to vertices so far
                idx.push_back(i > 0 ? i - 1 : nv + i);
                p = end;
                // skip the /vt/vn tail of the token
                while (*p && *p != ' ' && *p != '\t' && *p != '\n' &&
                       *p != '\r')
                    p++;
            }
            if (idx.size() >= 3) {
                for (size_t k = 1; k + 1 < idx.size(); k++) {
                    if (faces) {
                        if (nt >= max_tris) { std::fclose(fh); return false; }
                        faces[nt * 3 + 0] = idx[0];
                        faces[nt * 3 + 1] = idx[k];
                        faces[nt * 3 + 2] = idx[k + 1];
                    }
                    nt++;
                }
            }
        }
    }
    std::fclose(fh);
    if (counts) {
        counts->verts = nv;
        counts->tris = nt;
    }
    return true;
}

}  // namespace

extern "C" {

int apt_obj_count(const char* path, long* n_verts, long* n_tris) {
    Counts c;
    if (!parse(path, &c, nullptr, nullptr, 0, 0)) return 1;
    *n_verts = c.verts;
    *n_tris = c.tris;
    return 0;
}

int apt_obj_load(const char* path, double* verts, long long* faces,
                 long n_verts, long n_tris) {
    return parse(path, nullptr, verts, faces, n_verts, n_tris) ? 0 : 1;
}

}  // extern "C"
