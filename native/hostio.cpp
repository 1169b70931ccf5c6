// hostio: native host-side streaming I/O runtime for dspsr_tpu.
//
// TPU-native equivalent of the reference's host runtime pieces:
//  - PrefetchReader: background-thread block reader with a ring of buffers
//    (the performance role of dsp::Seekable's overlap recycling + the
//    IOManager block loop, Kernel/Classes/Seekable.C:70-222) so the Python
//    host loop never blocks on disk while the device computes.
//  - RingBuffer: POSIX shared-memory ring for live capture handoff between
//    an instrument writer process and the pipeline (the role of the psrdada
//    ring used by dsp::DADABuffer, Kernel/Formats/dada/DADABuffer.C) —
//    simplified protocol, not psrdada binary compatible.
//
// C ABI for ctypes. Build: make -C native

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------- prefetch

struct PrefetchReader {
  int fd = -1;
  int64_t header_bytes = 0;
  int64_t file_bytes = 0;
  int64_t block_bytes = 0;
  int64_t stride_bytes = 0;
  int depth = 0;

  std::vector<std::vector<uint8_t>> slots;
  std::vector<int64_t> slot_offset;   // byte offset of the block in each slot
  std::vector<int64_t> slot_valid;    // valid bytes in each slot (rest zero)
  int64_t next_read = 0;              // next block offset to read (producer)
  int64_t head = 0, tail = 0;         // ring indices (filled: [tail, head))
  bool eof = false;
  bool stop_flag = false;

  std::mutex m;
  std::condition_variable cv_space, cv_data;
  std::thread worker;

  void produce() {
    for (;;) {
      std::unique_lock<std::mutex> lk(m);
      cv_space.wait(lk, [&] { return stop_flag || head - tail < depth; });
      if (stop_flag) return;
      int64_t off = next_read;
      if (header_bytes + off >= file_bytes) {
        eof = true;
        cv_data.notify_all();
        return;
      }
      int slot = head % depth;
      next_read += stride_bytes;
      lk.unlock();

      auto& buf = slots[slot];
      int64_t want = block_bytes;
      int64_t avail = file_bytes - (header_bytes + off);
      int64_t take = avail < want ? avail : want;
      int64_t got = 0;
      while (got < take) {
        ssize_t r = pread(fd, buf.data() + got, take - got,
                          header_bytes + off + got);
        if (r <= 0) break;
        got += r;
      }
      if (got < want) memset(buf.data() + got, 0, want - got);

      lk.lock();
      slot_offset[slot] = off;
      slot_valid[slot] = got;
      head++;
      cv_data.notify_all();
    }
  }
};

PrefetchReader* prefetch_open(const char* path, int64_t header_bytes,
                              int64_t block_bytes, int64_t stride_bytes,
                              int depth) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  auto* r = new PrefetchReader();
  r->fd = fd;
  r->header_bytes = header_bytes;
  r->file_bytes = st.st_size;
  r->block_bytes = block_bytes;
  r->stride_bytes = stride_bytes;
  r->depth = depth;
  r->slots.resize(depth);
  for (auto& s : r->slots) s.resize(block_bytes);
  r->slot_offset.assign(depth, -1);
  r->slot_valid.assign(depth, 0);
  r->worker = std::thread([r] { r->produce(); });
  return r;
}

// Blocks until the next block is ready; copies it into out.
// Returns valid bytes (0 on end of data), and the block's byte offset.
int64_t prefetch_next(PrefetchReader* r, uint8_t* out, int64_t* offset_out) {
  std::unique_lock<std::mutex> lk(r->m);
  r->cv_data.wait(lk, [&] { return r->head > r->tail || r->eof; });
  if (r->head == r->tail) return 0;  // eof, drained
  int slot = r->tail % r->depth;
  int64_t valid = r->slot_valid[slot];
  if (offset_out) *offset_out = r->slot_offset[slot];
  memcpy(out, r->slots[slot].data(), r->block_bytes);
  r->tail++;
  r->cv_space.notify_one();
  return valid;
}

void prefetch_close(PrefetchReader* r) {
  {
    std::lock_guard<std::mutex> lk(r->m);
    r->stop_flag = true;
  }
  r->cv_space.notify_all();
  r->cv_data.notify_all();
  if (r->worker.joinable()) r->worker.join();
  close(r->fd);
  delete r;
}

// ---------------------------------------------------------------- SHM ring

// Layout in shared memory:
//   [ RingHeader | header_area (hdr_bytes) | data (nbufs * buf_bytes) ]
struct RingHeader {
  uint64_t magic;         // 'TPURING1'
  int64_t hdr_bytes;      // ASCII observation header area size
  int64_t buf_bytes;      // bytes per data buffer
  int64_t nbufs;
  std::atomic<int64_t> written;   // buffers written (monotonic)
  std::atomic<int64_t> read;      // buffers consumed (monotonic)
  std::atomic<int32_t> eod;       // writer signalled end-of-data
  std::atomic<int32_t> hdr_set;   // header written
};

static const uint64_t RING_MAGIC = 0x31474e4952555054ULL;  // "TPURING1"

struct Ring {
  int fd = -1;
  size_t total = 0;
  RingHeader* h = nullptr;
  uint8_t* hdr_area = nullptr;
  uint8_t* data = nullptr;
  char name[256];
};

static Ring* ring_map(const char* name, size_t total, bool create) {
  int flags = create ? (O_CREAT | O_RDWR) : O_RDWR;
  int fd = shm_open(name, flags, 0600);
  if (fd < 0) return nullptr;
  if (create && ftruncate(fd, total) != 0) {
    close(fd);
    return nullptr;
  }
  if (!create) {
    struct stat st;
    fstat(fd, &st);
    total = st.st_size;
  }
  void* p = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  if (p == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  auto* r = new Ring();
  r->fd = fd;
  r->total = total;
  r->h = reinterpret_cast<RingHeader*>(p);
  r->hdr_area = reinterpret_cast<uint8_t*>(p) + sizeof(RingHeader);
  snprintf(r->name, sizeof(r->name), "%s", name);
  return r;
}

Ring* ring_create(const char* name, int64_t hdr_bytes, int64_t buf_bytes,
                  int64_t nbufs) {
  size_t total = sizeof(RingHeader) + hdr_bytes + buf_bytes * nbufs;
  Ring* r = ring_map(name, total, true);
  if (!r) return nullptr;
  new (r->h) RingHeader();
  r->h->magic = RING_MAGIC;
  r->h->hdr_bytes = hdr_bytes;
  r->h->buf_bytes = buf_bytes;
  r->h->nbufs = nbufs;
  r->h->written = 0;
  r->h->read = 0;
  r->h->eod = 0;
  r->h->hdr_set = 0;
  r->data = r->hdr_area + hdr_bytes;
  return r;
}

Ring* ring_connect(const char* name) {
  Ring* r = ring_map(name, 0, false);
  if (!r) return nullptr;
  if (r->h->magic != RING_MAGIC) {
    munmap(r->h, r->total);
    close(r->fd);
    delete r;
    return nullptr;
  }
  r->data = r->hdr_area + r->h->hdr_bytes;
  return r;
}

void ring_write_header(Ring* r, const uint8_t* hdr, int64_t n) {
  if (n > r->h->hdr_bytes) n = r->h->hdr_bytes;
  memcpy(r->hdr_area, hdr, n);
  r->h->hdr_set = 1;
}

int ring_read_header(Ring* r, uint8_t* out, int64_t n) {
  if (!r->h->hdr_set) return 0;
  if (n > r->h->hdr_bytes) n = r->h->hdr_bytes;
  memcpy(out, r->hdr_area, n);
  return 1;
}

// Writer: returns 1 on success, 0 if the ring is full (non-blocking).
int ring_push(Ring* r, const uint8_t* buf) {
  int64_t w = r->h->written.load(std::memory_order_acquire);
  int64_t rd = r->h->read.load(std::memory_order_acquire);
  if (w - rd >= r->h->nbufs) return 0;
  memcpy(r->data + (w % r->h->nbufs) * r->h->buf_bytes, buf, r->h->buf_bytes);
  r->h->written.store(w + 1, std::memory_order_release);
  return 1;
}

// Reader: returns 1 with a buffer, 0 if empty, -1 on end-of-data drained.
int ring_pop(Ring* r, uint8_t* out) {
  int64_t w = r->h->written.load(std::memory_order_acquire);
  int64_t rd = r->h->read.load(std::memory_order_acquire);
  if (rd == w) return r->h->eod.load() ? -1 : 0;
  memcpy(out, r->data + (rd % r->h->nbufs) * r->h->buf_bytes, r->h->buf_bytes);
  r->h->read.store(rd + 1, std::memory_order_release);
  return 1;
}

void ring_set_eod(Ring* r) { r->h->eod = 1; }

int64_t ring_buf_bytes(Ring* r) { return r->h->buf_bytes; }
int64_t ring_hdr_bytes(Ring* r) { return r->h->hdr_bytes; }
int64_t ring_fill(Ring* r) { return r->h->written.load() - r->h->read.load(); }

void ring_close(Ring* r, int unlink_it) {
  char name[256];
  snprintf(name, sizeof(name), "%s", r->name);
  munmap(r->h, r->total);
  close(r->fd);
  if (unlink_it) shm_unlink(name);
  delete r;
}

}  // extern "C"
