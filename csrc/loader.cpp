// Native data loader for mmpde_tpu.
//
// Role: the TPU-native equivalent of the reference's host-side data path
// (torch DataLoader with num_workers=4, reference mmpde.py:205-213, plus the
// per-step window slicing of GraphCreator.create_data).  The dataset file
// (.npy, float32, C-order) is memory-mapped; a producer thread assembles
// (history window, label window, step) batches into a lock-free-ish ring of
// preallocated slots so the training loop never waits on Python-side
// slicing or page faults.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <fcntl.h>
#include <mutex>
#include <random>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Dataset {
  int fd = -1;
  void* map = nullptr;
  size_t map_size = 0;
  const float* data = nullptr;  // [n_traj, nt, spatial...]
  int64_t shape[8] = {0};
  int ndim = 0;
  int64_t spatial = 1;  // product of dims after (traj, time)
};

// Minimal .npy v1/v2 header parser for little-endian float32 C-order files.
bool parse_npy(const uint8_t* p, size_t size, Dataset* ds, size_t* offset) {
  if (size < 10 || memcmp(p, "\x93NUMPY", 6) != 0) return false;
  int major = p[6];
  size_t hlen, hstart;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    hstart = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) | ((size_t)p[11] << 24);
    hstart = 12;
  }
  std::string header((const char*)p + hstart, hlen);
  if (header.find("'descr': '<f4'") == std::string::npos &&
      header.find("'descr': '|f4'") == std::string::npos)
    return false;
  if (header.find("'fortran_order': False") == std::string::npos)
    return false;
  size_t sp = header.find("'shape': (");
  if (sp == std::string::npos) return false;
  sp += 10;
  ds->ndim = 0;
  while (sp < header.size() && header[sp] != ')') {
    while (sp < header.size() && (header[sp] == ' ' || header[sp] == ','))
      ++sp;
    if (header[sp] == ')') break;
    ds->shape[ds->ndim++] = strtoll(header.c_str() + sp, nullptr, 10);
    while (sp < header.size() && header[sp] != ',' && header[sp] != ')')
      ++sp;
  }
  *offset = hstart + hlen;
  return ds->ndim >= 2;
}

struct Batch {
  std::vector<float> data;    // [B, tw, spatial]
  std::vector<float> labels;  // [B, tw, spatial]
  std::vector<int64_t> steps; // [B]
  std::vector<int64_t> traj;  // [B]
};

struct Sampler {
  Dataset* ds = nullptr;
  int batch = 0, tw = 0;
  int64_t lo = 0, hi = 0;      // trajectory index range [lo, hi)
  // current pushforward range shrink (tw units); written by the consumer
  // thread (mm_sampler_set_shrink), read by the producer in fill()
  std::atomic<int> max_unroll_shrink{0};
  std::mt19937_64 rng;

  // ring of prefilled batches
  std::vector<Batch> ring;
  std::atomic<bool> stop{false};
  size_t head = 0, tail = 0, capacity = 0;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::thread producer;

  void fill(Batch* b) {
    const int64_t nt = ds->shape[1];
    const int64_t sp = ds->spatial;
    std::uniform_int_distribution<int64_t> traj_d(lo, hi - 1);
    int64_t shrink =
        (int64_t)tw * max_unroll_shrink.load(std::memory_order_relaxed);
    // exclusive upper bound: the last valid start step nt - tw - shrink is
    // included, matching train.py random_start_steps and the reference's
    // range(tw, nt - tw - shrink + 1)
    int64_t step_hi = nt - tw - shrink + 1;
    if (step_hi <= tw) step_hi = tw + 1;
    std::uniform_int_distribution<int64_t> step_d(tw, step_hi - 1);
    for (int i = 0; i < batch; ++i) {
      int64_t t = traj_d(rng);
      int64_t s = step_d(rng);
      b->traj[i] = t;
      b->steps[i] = s;
      const float* base = ds->data + (t * nt + (s - tw)) * sp;
      memcpy(b->data.data() + (size_t)i * tw * sp, base,
             sizeof(float) * tw * sp);
      memcpy(b->labels.data() + (size_t)i * tw * sp, base + (size_t)tw * sp,
             sizeof(float) * tw * sp);
    }
  }

  void run() {
    while (!stop.load()) {
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] {
        return stop.load() || (head - tail) < capacity;
      });
      if (stop.load()) return;
      Batch* slot = &ring[head % capacity];
      lk.unlock();
      fill(slot);
      lk.lock();
      ++head;
      cv_empty.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* mm_open(const char* path) {
  auto* ds = new Dataset();
  ds->fd = open(path, O_RDONLY);
  if (ds->fd < 0) { delete ds; return nullptr; }
  struct stat st;
  fstat(ds->fd, &st);
  ds->map_size = st.st_size;
  ds->map = mmap(nullptr, ds->map_size, PROT_READ, MAP_PRIVATE, ds->fd, 0);
  if (ds->map == MAP_FAILED) { close(ds->fd); delete ds; return nullptr; }
  madvise(ds->map, ds->map_size, MADV_WILLNEED);
  size_t offset = 0;
  if (!parse_npy((const uint8_t*)ds->map, ds->map_size, ds, &offset)) {
    munmap(ds->map, ds->map_size);
    close(ds->fd);
    delete ds;
    return nullptr;
  }
  ds->data = (const float*)((const uint8_t*)ds->map + offset);
  ds->spatial = 1;
  for (int i = 2; i < ds->ndim; ++i) ds->spatial *= ds->shape[i];
  return ds;
}

int mm_ndim(void* h) { return ((Dataset*)h)->ndim; }

void mm_shape(void* h, int64_t* out) {
  auto* ds = (Dataset*)h;
  for (int i = 0; i < ds->ndim; ++i) out[i] = ds->shape[i];
}

void mm_close(void* h) {
  auto* ds = (Dataset*)h;
  if (ds->map) munmap(ds->map, ds->map_size);
  if (ds->fd >= 0) close(ds->fd);
  delete ds;
}

void* mm_sampler_new(void* dsh, int batch, int tw, int64_t lo, int64_t hi,
                     uint64_t seed, int prefetch) {
  auto* ds = (Dataset*)dsh;
  auto* s = new Sampler();
  s->ds = ds;
  s->batch = batch;
  s->tw = tw;
  s->lo = lo;
  s->hi = hi;
  s->rng.seed(seed);
  s->capacity = prefetch > 0 ? prefetch : 2;
  s->ring.resize(s->capacity);
  size_t n = (size_t)batch * tw * ds->spatial;
  for (auto& b : s->ring) {
    b.data.resize(n);
    b.labels.resize(n);
    b.steps.resize(batch);
    b.traj.resize(batch);
  }
  s->producer = std::thread([s] { s->run(); });
  return s;
}

void mm_sampler_set_shrink(void* sh, int shrink) {
  // pushforward-style sampling-range shrink (train_helper_2d.py:100-104).
  // Takes effect on subsequently produced batches.
  ((Sampler*)sh)->max_unroll_shrink.store(shrink, std::memory_order_relaxed);
}

// Copies the next prefilled batch into caller-owned buffers.
void mm_sampler_next(void* sh, float* data_out, float* labels_out,
                     int64_t* steps_out) {
  auto* s = (Sampler*)sh;
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_empty.wait(lk, [&] { return s->head > s->tail; });
  Batch* b = &s->ring[s->tail % s->capacity];
  lk.unlock();
  memcpy(data_out, b->data.data(), b->data.size() * sizeof(float));
  memcpy(labels_out, b->labels.data(), b->labels.size() * sizeof(float));
  memcpy(steps_out, b->steps.data(), b->steps.size() * sizeof(int64_t));
  lk.lock();
  ++s->tail;
  s->cv_full.notify_one();
}

void mm_sampler_free(void* sh) {
  auto* s = (Sampler*)sh;
  s->stop.store(true);
  s->cv_full.notify_all();
  s->cv_empty.notify_all();
  if (s->producer.joinable()) s->producer.join();
  delete s;
}

}  // extern "C"
