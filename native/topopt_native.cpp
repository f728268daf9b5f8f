// topopt_native — host-side native kernels for mesh preprocessing.
//
// TPU-native framework's counterpart to the native (C) functionality the
// reference reaches through its dependencies (CHOLMOD/BLAS/zlib —
// SURVEY.md §2.3): the device compute path is XLA/Pallas, and the
// host-side preprocessing hot spots (hash-heavy surface-face counting,
// reference algorithm SelectNodesForBC.jl:59-91) run natively here with a
// pure-NumPy fallback when the library is absent.
//
// Build: make -C native    (g++ -O3 -shared -fPIC)
// Binding: ctypes (topopteval_tpu/io/native.py)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct FaceKey {
    uint32_t n[4];
    bool operator==(const FaceKey& o) const {
        return n[0] == o.n[0] && n[1] == o.n[1] && n[2] == o.n[2] &&
               n[3] == o.n[3];
    }
};

struct FaceKeyHash {
    size_t operator()(const FaceKey& k) const {
        // splitmix64-style mixing of the four node ids
        uint64_t h = 0x9e3779b97f4a7c15ull;
        for (int i = 0; i < 4; ++i) {
            uint64_t x = k.n[i] + 0x9e3779b97f4a7c15ull + h;
            x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
            x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
            h = x ^ (x >> 31);
        }
        return static_cast<size_t>(h);
    }
};

inline FaceKey make_key(const int32_t* cell, const int32_t* face,
                        int32_t face_k) {
    uint32_t v[4] = {0xffffffffu, 0xffffffffu, 0xffffffffu, 0xffffffffu};
    for (int32_t j = 0; j < face_k; ++j)
        v[j] = static_cast<uint32_t>(cell[face[j]]);
    // sorting network for <=4 entries (canonical face representation,
    // same role as the reference's sorted tuples)
    if (v[0] > v[1]) std::swap(v[0], v[1]);
    if (v[2] > v[3]) std::swap(v[2], v[3]);
    if (v[0] > v[2]) std::swap(v[0], v[2]);
    if (v[1] > v[3]) std::swap(v[1], v[3]);
    if (v[1] > v[2]) std::swap(v[1], v[2]);
    return FaceKey{{v[0], v[1], v[2], v[3]}};
}

}  // namespace

extern "C" {

// Surface faces = faces referenced by exactly one cell.
// Writes flat indices (cell * n_faces + local_face) of surface faces to
// out_idx (capacity n_cells*n_faces); returns their count.
int64_t topopt_extract_surface_faces(const int32_t* conn, int64_t n_cells,
                                     int32_t nodes_per_cell,
                                     const int32_t* face_table,
                                     int32_t n_faces, int32_t face_k,
                                     int64_t* out_idx) {
    std::unordered_map<FaceKey, int64_t, FaceKeyHash> first;  // key -> flat
    first.reserve(static_cast<size_t>(n_cells) * n_faces * 2);
    // second occurrence flips the stored index negative (face is interior)
    for (int64_t c = 0; c < n_cells; ++c) {
        const int32_t* cell = conn + c * nodes_per_cell;
        for (int32_t f = 0; f < n_faces; ++f) {
            FaceKey key = make_key(cell, face_table + f * face_k, face_k);
            int64_t flat = c * n_faces + f;
            auto it = first.find(key);
            if (it == first.end())
                first.emplace(key, flat);
            else
                it->second = -1;  // seen >=2 times -> interior
        }
    }
    int64_t n_out = 0;
    for (const auto& kv : first)
        if (kv.second >= 0) out_idx[n_out++] = kv.second;
    std::sort(out_idx, out_idx + n_out);
    return n_out;
}

// Mark surface nodes: nodes[i]=1 for every node referenced by a surface
// face. Inputs are the flat surface-face indices from the call above.
void topopt_mark_face_nodes(const int32_t* conn, int32_t nodes_per_cell,
                            const int32_t* face_table, int32_t n_faces,
                            int32_t face_k, const int64_t* face_idx,
                            int64_t n_faces_out, uint8_t* node_mark) {
    for (int64_t i = 0; i < n_faces_out; ++i) {
        int64_t c = face_idx[i] / n_faces;
        int32_t f = static_cast<int32_t>(face_idx[i] % n_faces);
        const int32_t* cell = conn + c * nodes_per_cell;
        const int32_t* face = face_table + f * face_k;
        for (int32_t j = 0; j < face_k; ++j) node_mark[cell[face[j]]] = 1;
    }
}

int topopt_version() { return 1; }

}  // extern "C"
