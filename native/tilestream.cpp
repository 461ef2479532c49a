// Native tile-streaming runtime for OMGTILE grid files.
//
// C++ counterpart of the reference's TileManager subsystem
// (platforms/cuda/src/TileManager.{h,cpp}): random-access tile reads from
// the OMGTILE v1 format, an LRU tile cache with hit/miss/eviction counters,
// and clamped region assembly (the halo-gather that feeds fixed-size
// device buffers). Exposed as a plain C ABI for ctypes binding.
//
// File format (see openmmgridforce_tpu/io/omgtile.py and reference
// openmmapi/src/TiledGridData.cpp:102-260):
//   header(64B): magic "OMGTILE\0", u32 version, u32 headerSize, u32 flags,
//                u32 tileSize, 40B reserved
//   metadata:    u32 counts[3], f64 spacing[3], f64 origin[3], f64 invPower,
//                u32 invPowerMode, u32 numTiles, i64 tileIndexOffset
//   tile:        u16 dims[3], f32 values[n], [f32 derivs[27*n]]
//   index:       per tile: i32 tx,ty,tz, i64 offset, i64 size

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <list>
#include <map>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct TileKey {
    int tx, ty, tz;
    bool operator==(const TileKey& o) const {
        return tx == o.tx && ty == o.ty && tz == o.tz;
    }
};

struct TileKeyHash {
    size_t operator()(const TileKey& k) const {
        return (size_t)k.tx * 73856093u ^ (size_t)k.ty * 19349663u
               ^ (size_t)k.tz * 83492791u;
    }
};

struct Tile {
    int sx, sy, sz;
    std::vector<float> values;     // [sx*sy*sz], z fastest
    std::vector<float> derivs;     // [27 * n] or empty
    size_t bytes() const {
        return (values.size() + derivs.size()) * sizeof(float);
    }
};

struct IndexEntry {
    int64_t offset;
    int64_t size;
};

struct TileStream {
    FILE* fh = nullptr;
    std::mutex mu;
    uint32_t counts[3] = {0, 0, 0};
    double spacing[3] = {0, 0, 0};
    double origin[3] = {0, 0, 0};
    double inv_power = 0.0;
    uint32_t inv_power_mode = 0;
    uint32_t tile_size = 0;
    bool has_derivs = false;
    int ntx = 0, nty = 0, ntz = 0;
    std::vector<IndexEntry> index;

    // LRU cache
    size_t budget_bytes = (size_t)2048 * 1024 * 1024;  // reference default
    size_t used_bytes = 0;
    std::list<TileKey> lru;  // front = most recent
    std::unordered_map<TileKey,
                       std::pair<Tile, std::list<TileKey>::iterator>,
                       TileKeyHash> cache;
    uint64_t hits = 0, misses = 0, evictions = 0;

    int linear(int tx, int ty, int tz) const {
        return (tx * nty + ty) * ntz + tz;
    }
};

bool read_exact(FILE* fh, void* dst, size_t n) {
    return fread(dst, 1, n, fh) == n;
}

template <typename T>
bool read_pod(FILE* fh, T* v) { return read_exact(fh, v, sizeof(T)); }

constexpr int kDiv = 27;

}  // namespace

extern "C" {

// Returns an opaque handle or nullptr on failure.
void* omg_open(const char* path) {
    FILE* fh = fopen(path, "rb");
    if (!fh) return nullptr;
    char magic[8];
    uint32_t version, header_size, flags, tile_size;
    if (!read_exact(fh, magic, 8) || memcmp(magic, "OMGTILE\0", 8) != 0 ||
        !read_pod(fh, &version) || version != 1 ||
        !read_pod(fh, &header_size) || !read_pod(fh, &flags) ||
        !read_pod(fh, &tile_size)) {
        fclose(fh);
        return nullptr;
    }
    fseek(fh, header_size, SEEK_SET);

    auto* ts = new TileStream();
    ts->fh = fh;
    ts->tile_size = tile_size;
    ts->has_derivs = (flags & 0x01) != 0;
    uint32_t num_tiles;
    int64_t index_offset;
    if (!read_exact(fh, ts->counts, 12) ||
        !read_exact(fh, ts->spacing, 24) ||
        !read_exact(fh, ts->origin, 24) ||
        !read_pod(fh, &ts->inv_power) ||
        !read_pod(fh, &ts->inv_power_mode) ||
        !read_pod(fh, &num_tiles) || !read_pod(fh, &index_offset)) {
        fclose(fh);
        delete ts;
        return nullptr;
    }
    auto ceil_div = [](uint32_t a, uint32_t b) { return (a + b - 1) / b; };
    ts->ntx = ceil_div(ts->counts[0], tile_size);
    ts->nty = ceil_div(ts->counts[1], tile_size);
    ts->ntz = ceil_div(ts->counts[2], tile_size);
    if ((int)num_tiles != ts->ntx * ts->nty * ts->ntz) {
        fclose(fh);
        delete ts;
        return nullptr;
    }
    ts->index.resize(num_tiles);
    fseek(fh, (long)index_offset, SEEK_SET);
    for (uint32_t t = 0; t < num_tiles; t++) {
        int32_t tx, ty, tz;
        int64_t off, size;
        if (!read_pod(fh, &tx) || !read_pod(fh, &ty) || !read_pod(fh, &tz) ||
            !read_pod(fh, &off) || !read_pod(fh, &size)) {
            fclose(fh);
            delete ts;
            return nullptr;
        }
        ts->index[ts->linear(tx, ty, tz)] = {off, size};
    }
    return ts;
}

void omg_close(void* handle) {
    auto* ts = static_cast<TileStream*>(handle);
    if (!ts) return;
    fclose(ts->fh);
    delete ts;
}

void omg_meta(void* handle, uint32_t* counts, double* spacing,
              double* origin, uint32_t* tile_size, int* has_derivs,
              double* inv_power, uint32_t* inv_power_mode) {
    auto* ts = static_cast<TileStream*>(handle);
    memcpy(counts, ts->counts, 12);
    memcpy(spacing, ts->spacing, 24);
    memcpy(origin, ts->origin, 24);
    *tile_size = ts->tile_size;
    *has_derivs = ts->has_derivs ? 1 : 0;
    *inv_power = ts->inv_power;
    *inv_power_mode = ts->inv_power_mode;
}

void omg_set_budget(void* handle, uint64_t bytes) {
    static_cast<TileStream*>(handle)->budget_bytes = bytes;
}

void omg_cache_stats(void* handle, uint64_t* hits, uint64_t* misses,
                     uint64_t* evictions, uint64_t* used_bytes) {
    auto* ts = static_cast<TileStream*>(handle);
    *hits = ts->hits;
    *misses = ts->misses;
    *evictions = ts->evictions;
    *used_bytes = ts->used_bytes;
}

namespace {

// Load a tile through the LRU cache; returns nullptr on IO error.
const Tile* fetch_tile(TileStream* ts, int tx, int ty, int tz) {
    TileKey key{tx, ty, tz};
    auto it = ts->cache.find(key);
    if (it != ts->cache.end()) {
        ts->hits++;
        ts->lru.splice(ts->lru.begin(), ts->lru, it->second.second);
        return &it->second.first;
    }
    ts->misses++;
    const IndexEntry& e = ts->index[ts->linear(tx, ty, tz)];
    fseek(ts->fh, (long)e.offset, SEEK_SET);
    uint16_t dims[3];
    if (!read_exact(ts->fh, dims, 6)) return nullptr;
    Tile tile;
    tile.sx = dims[0];
    tile.sy = dims[1];
    tile.sz = dims[2];
    size_t n = (size_t)tile.sx * tile.sy * tile.sz;
    tile.values.resize(n);
    if (!read_exact(ts->fh, tile.values.data(), n * sizeof(float)))
        return nullptr;
    if (ts->has_derivs) {
        tile.derivs.resize(kDiv * n);
        if (!read_exact(ts->fh, tile.derivs.data(),
                        kDiv * n * sizeof(float)))
            return nullptr;
    }
    // evict LRU until within budget
    size_t incoming = tile.bytes();
    while (!ts->lru.empty() && ts->used_bytes + incoming > ts->budget_bytes) {
        TileKey victim = ts->lru.back();
        ts->lru.pop_back();
        auto vit = ts->cache.find(victim);
        ts->used_bytes -= vit->second.first.bytes();
        ts->cache.erase(vit);
        ts->evictions++;
    }
    ts->lru.push_front(key);
    auto res = ts->cache.emplace(
        key, std::make_pair(std::move(tile), ts->lru.begin()));
    ts->used_bytes += incoming;
    return &res.first->second.first;
}

}  // namespace

// Read one tile (values [sx*sy*sz] and optionally derivs [27*n]).
// Returns 0 on success.
int omg_read_tile(void* handle, int tx, int ty, int tz, float* values,
                  float* derivs) {
    auto* ts = static_cast<TileStream*>(handle);
    std::lock_guard<std::mutex> lock(ts->mu);
    const Tile* t = fetch_tile(ts, tx, ty, tz);
    if (!t) return 1;
    memcpy(values, t->values.data(), t->values.size() * sizeof(float));
    if (derivs && ts->has_derivs)
        memcpy(derivs, t->derivs.data(), t->derivs.size() * sizeof(float));
    return 0;
}

// Assemble an arbitrary [nx, ny, nz] region (grid-point coordinates,
// clamped to the grid bounds like the reference's halo assembly,
// TileManager.cpp:200-326) into caller buffers. ``derivs_out`` may be
// null; when present it receives [27, nx, ny, nz]. Returns 0 on success.
int omg_read_region(void* handle, int64_t x0, int64_t y0, int64_t z0,
                    int64_t nx, int64_t ny, int64_t nz, float* values_out,
                    float* derivs_out) {
    auto* ts = static_cast<TileStream*>(handle);
    std::lock_guard<std::mutex> lock(ts->mu);
    const int64_t NX = ts->counts[0], NY = ts->counts[1],
                  NZ = ts->counts[2];
    const int T = (int)ts->tile_size;
    const int64_t region = nx * ny * nz;

    for (int64_t ix = 0; ix < nx; ix++) {
        int64_t gx = std::min(std::max(x0 + ix, (int64_t)0), NX - 1);
        int tx = (int)(gx / T);
        for (int64_t iy = 0; iy < ny; iy++) {
            int64_t gy = std::min(std::max(y0 + iy, (int64_t)0), NY - 1);
            int ty = (int)(gy / T);
            // z runs are contiguous within one tile; walk tile-by-tile.
            // Clamped segments (z outside the grid) replicate one boundary
            // element across the whole segment with a single fetch.
            int64_t iz = 0;
            while (iz < nz) {
                int64_t gz = std::min(std::max(z0 + iz, (int64_t)0),
                                      NZ - 1);
                int tz = (int)(gz / T);
                const Tile* t = fetch_tile(ts, tx, ty, tz);
                if (!t) return 1;
                int64_t lx = gx - (int64_t)tx * T;
                int64_t ly = gy - (int64_t)ty * T;
                int64_t lz = gz - (int64_t)tz * T;
                int64_t run, fill;  // run = copied elems, fill = replicated
                if (z0 + iz < 0) {
                    run = 1;
                    fill = std::min(-(z0 + iz), nz - iz);
                } else if (z0 + iz >= NZ) {
                    run = 1;
                    fill = nz - iz;
                } else {
                    int64_t tile_end = std::min((int64_t)(tz + 1) * T, NZ);
                    run = std::min({tile_end - gz, nz - iz,
                                    NZ - (z0 + iz)});
                    fill = run;
                }
                const float* src =
                    t->values.data() + (lx * t->sy + ly) * t->sz + lz;
                float* dst = values_out + (ix * ny + iy) * nz + iz;
                if (run == 1 && fill > 1) {
                    std::fill(dst, dst + fill, src[0]);
                } else {
                    memcpy(dst, src, run * sizeof(float));
                }
                if (derivs_out && ts->has_derivs) {
                    size_t tn = (size_t)t->sx * t->sy * t->sz;
                    for (int d = 0; d < kDiv; d++) {
                        const float* dsrc = t->derivs.data() + d * tn +
                                            (lx * t->sy + ly) * t->sz + lz;
                        float* ddst = derivs_out + d * region +
                                      (ix * ny + iy) * nz + iz;
                        if (run == 1 && fill > 1) {
                            std::fill(ddst, ddst + fill, dsrc[0]);
                        } else {
                            memcpy(ddst, dsrc, run * sizeof(float));
                        }
                    }
                }
                iz += fill;
            }
        }
    }
    return 0;
}

}  // extern "C"
