// recordstore — a single-file memory-mapped record store.
//
// TPU-native replacement for the reference's LMDB cache
// (legacy/camvid_lmdb.py:151-213): the legacy code packs encoded PNGs into
// an LMDB environment to beat filesystem I/O; here records live in ONE
// mmap-able file with a fixed header + offset index + blob area, so a
// dataset opens with a single mmap (zero-copy) and record access is
// pointer arithmetic — no C library dependency, no transactions needed for
// a read-mostly training cache.
//
// Layout (little-endian):
//   [0..8)    magic "CVRS0001"
//   [8..16)   uint64 n_records
//   [16..16+16*n) per-record {uint64 offset, uint64 length} (from file start)
//   [..]      blob bytes
//
// Exposed as a C ABI for ctypes (build: make -C native).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'C', 'V', 'R', 'S', '0', '0', '0', '1'};

struct IndexEntry {
  uint64_t offset;
  uint64_t length;
};

struct Store {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n = 0;
  const IndexEntry* index = nullptr;
};

}  // namespace

extern "C" {

// Write a store from n buffers. Returns 0 on success.
int rs_write(const char* path, const uint8_t* const* bufs,
             const uint64_t* lengths, uint64_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  if (fwrite(kMagic, 1, 8, f) != 8) { fclose(f); return -2; }
  if (fwrite(&n, 8, 1, f) != 1) { fclose(f); return -2; }
  uint64_t data_start = 16 + 16 * n;
  uint64_t off = data_start;
  for (uint64_t i = 0; i < n; i++) {
    IndexEntry e{off, lengths[i]};
    if (fwrite(&e, sizeof(e), 1, f) != 1) { fclose(f); return -2; }
    off += lengths[i];
  }
  for (uint64_t i = 0; i < n; i++) {
    if (lengths[i] && fwrite(bufs[i], 1, lengths[i], f) != lengths[i]) {
      fclose(f);
      return -2;
    }
  }
  if (fclose(f) != 0) return -3;
  return 0;
}

// Open (mmap) a store. Returns an opaque handle or nullptr.
void* rs_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 16) { close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { close(fd); return nullptr; }
  auto* s = new Store;
  s->fd = fd;
  s->base = static_cast<uint8_t*>(base);
  s->size = st.st_size;
  if (memcmp(s->base, kMagic, 8) != 0) {
    munmap(base, st.st_size); close(fd); delete s; return nullptr;
  }
  memcpy(&s->n, s->base + 8, 8);
  // divide instead of multiplying: 16*n wraps for a corrupt header with a
  // huge n_records, which would pass the check and let index reads walk
  // past the mapping
  if (s->n > (s->size - 16) / 16) {
    munmap(base, st.st_size); close(fd); delete s; return nullptr;
  }
  s->index = reinterpret_cast<const IndexEntry*>(s->base + 16);
  return s;
}

uint64_t rs_count(void* handle) {
  return handle ? static_cast<Store*>(handle)->n : 0;
}

uint64_t rs_length(void* handle, uint64_t i) {
  auto* s = static_cast<Store*>(handle);
  if (!s || i >= s->n) return 0;
  return s->index[i].length;
}

// Copy record i into out (must hold rs_length bytes). Returns bytes copied.
uint64_t rs_read(void* handle, uint64_t i, uint8_t* out) {
  auto* s = static_cast<Store*>(handle);
  if (!s || i >= s->n) return 0;
  const IndexEntry& e = s->index[i];
  if (e.offset + e.length > s->size) return 0;
  memcpy(out, s->base + e.offset, e.length);
  return e.length;
}

// Zero-copy pointer to record i (valid while the store is open).
const uint8_t* rs_data(void* handle, uint64_t i, uint64_t* length_out) {
  auto* s = static_cast<Store*>(handle);
  if (!s || i >= s->n) { if (length_out) *length_out = 0; return nullptr; }
  const IndexEntry& e = s->index[i];
  if (e.offset + e.length > s->size) return nullptr;
  if (length_out) *length_out = e.length;
  return s->base + e.offset;
}

void rs_close(void* handle) {
  auto* s = static_cast<Store*>(handle);
  if (!s) return;
  munmap(s->base, s->size);
  close(s->fd);
  delete s;
}

}  // extern "C"
