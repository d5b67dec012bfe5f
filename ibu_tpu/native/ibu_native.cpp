// Native host runtime for ibu_tpu: fast file I/O, a threaded record engine,
// and a host-side 2-bit codec.
//
// Role: the host-side counterpart of the device kernels — the pieces the
// reference implements in Rust (buffered writer writer.rs:82-523, bulk
// loader reader.rs:510-535, mmap + thread engine mmap.rs:286-332) are here
// implemented as a small C++ library with a C ABI consumed via ctypes
// (ibu_tpu/native/bindings.py). Python orchestrates; this file owns the
// syscall/memory hot paths that CPython cannot drive at speed.
//
// All functions return 0 on success or a negative errno-style code.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

static const uint64_t RECORD_SIZE = 24;

struct IbuRecord {
  uint64_t barcode;
  uint64_t umi;
  uint64_t index;
};
static_assert(sizeof(IbuRecord) == 24, "wire record must be 24 bytes");

// ---------------------------------------------------------------------------
// bulk file I/O
// ---------------------------------------------------------------------------

// Write header (32 bytes, may be null) + payload to path in large writes.
int ibu_write_file(const char* path, const uint8_t* header32,
                   const uint8_t* data, uint64_t nbytes) {
  int fd = ::open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -errno;
  if (header32 != nullptr) {
    ssize_t w = ::write(fd, header32, 32);
    if (w != 32) { int e = errno; ::close(fd); return -(e ? e : EIO); }
  }
  uint64_t off = 0;
  while (off < nbytes) {
    size_t chunk = std::min<uint64_t>(nbytes - off, 1ull << 30);
    ssize_t w = ::write(fd, data + off, chunk);
    if (w < 0) { int e = errno; ::close(fd); return -e; }
    off += static_cast<uint64_t>(w);
  }
  if (::close(fd) != 0) return -errno;
  return 0;
}

// Read nbytes at byte offset into out (pread loop).
int ibu_read_file(const char* path, uint8_t* out, uint64_t nbytes,
                  uint64_t offset) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  uint64_t got = 0;
  while (got < nbytes) {
    ssize_t r = ::pread(fd, out + got, nbytes - got,
                        static_cast<off_t>(offset + got));
    if (r < 0) { int e = errno; ::close(fd); return -e; }
    if (r == 0) { ::close(fd); return -EIO; }  // short file
    got += static_cast<uint64_t>(r);
  }
  ::close(fd);
  return 0;
}

// File size query (returns <0 on error, else size via out).
int ibu_file_size(const char* path, uint64_t* out) {
  struct stat st;
  if (::stat(path, &st) != 0) return -errno;
  *out = static_cast<uint64_t>(st.st_size);
  return 0;
}

// ---------------------------------------------------------------------------
// threaded parallel engine (reference mmap.rs:286-332 parity on the host)
// ---------------------------------------------------------------------------

// Sum the three record fields over [0, n) records with nthreads, using the
// reference's contiguous remainder-to-last partition. Wrapping u64 adds.
int ibu_checksum_parallel(const char* path, uint64_t n_records,
                          uint64_t* out3, int nthreads) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (::fstat(fd, &st) != 0) { int e = errno; ::close(fd); return -e; }
  uint64_t need = 32 + n_records * RECORD_SIZE;
  if (static_cast<uint64_t>(st.st_size) < need) { ::close(fd); return -EINVAL; }
  void* map = ::mmap(nullptr, need, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return -errno;
  const IbuRecord* recs =
      reinterpret_cast<const IbuRecord*>(static_cast<const uint8_t*>(map) + 32);

  if (nthreads <= 0) nthreads = std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min<int>(nthreads, 256));
  uint64_t per = n_records / nthreads;
  std::vector<std::thread> threads;
  std::vector<uint64_t> partial(static_cast<size_t>(nthreads) * 3, 0);
  for (int t = 0; t < nthreads; ++t) {
    uint64_t start = static_cast<uint64_t>(t) * per;
    uint64_t end = (t == nthreads - 1) ? n_records : start + per;
    threads.emplace_back([recs, start, end, t, &partial]() {
      uint64_t b = 0, u = 0, i = 0;
      for (uint64_t k = start; k < end; ++k) {
        b += recs[k].barcode;
        u += recs[k].umi;
        i += recs[k].index;
      }
      partial[3 * t + 0] = b;
      partial[3 * t + 1] = u;
      partial[3 * t + 2] = i;
    });
  }
  for (auto& th : threads) th.join();
  out3[0] = out3[1] = out3[2] = 0;
  for (int t = 0; t < nthreads; ++t) {
    out3[0] += partial[3 * t + 0];
    out3[1] += partial[3 * t + 1];
    out3[2] += partial[3 * t + 2];
  }
  ::munmap(map, need);
  return 0;
}

// ---------------------------------------------------------------------------
// host 2-bit codec (bitnuc semantics; same table as the device kernels)
// ---------------------------------------------------------------------------

// Pack n sequences of L ASCII bases (row-major, n x L) into u64 words.
// Returns -EINVAL on the first invalid base when validate != 0.
int ibu_pack_2bit(const uint8_t* ascii, uint64_t n, uint32_t L,
                  uint64_t* out, int validate) {
  if (L == 0 || L > 32) return -EINVAL;
  for (uint64_t r = 0; r < n; ++r) {
    const uint8_t* row = ascii + r * L;
    uint64_t word = 0;
    if (validate) {
      for (uint32_t i = 0; i < L; ++i) {
        uint8_t c = row[i] & 0xDF;  // uppercase
        if (c != 'A' && c != 'C' && c != 'G' && c != 'T') return -EINVAL;
      }
    }
    for (uint32_t i = 0; i < L; ++i) {
      uint64_t t = (row[i] >> 1) & 3;
      word |= (t ^ (t >> 1)) << (2 * i);
    }
    out[r] = word;
  }
  return 0;
}

// Unpack n u64 words into n x L uppercase ASCII bases (row-major).
int ibu_unpack_2bit(const uint64_t* words, uint64_t n, uint32_t L,
                    uint8_t* out) {
  if (L == 0 || L > 32) return -EINVAL;
  static const char LUT[4] = {'A', 'C', 'G', 'T'};
  for (uint64_t r = 0; r < n; ++r) {
    uint64_t w = words[r];
    uint8_t* row = out + r * L;
    for (uint32_t i = 0; i < L; ++i) {
      row[i] = static_cast<uint8_t>(LUT[(w >> (2 * i)) & 3]);
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// record sort (lexicographic barcode → umi → index; record.rs:29-32)
// ---------------------------------------------------------------------------

int ibu_sort_records(uint8_t* records_bytes, uint64_t n_records) {
  IbuRecord* recs = reinterpret_cast<IbuRecord*>(records_bytes);
  std::sort(recs, recs + n_records, [](const IbuRecord& a, const IbuRecord& b) {
    if (a.barcode != b.barcode) return a.barcode < b.barcode;
    if (a.umi != b.umi) return a.umi < b.umi;
    return a.index < b.index;
  });
  return 0;
}

}  // extern "C"
