// Native async checkpoint writer for mmpde_tpu.
//
// Role: the write-side twin of loader.cpp.  The reference torch.saves its
// checkpoint dict synchronously inside the epoch loop (reference
// mmpde.py:316-319, mesh/dmm.py:85) — at TPU step rates that is dead time
// on the host critical path.  Here the training loop hands the serialised
// state (flax msgpack bytes + config JSON) to a writer thread and returns
// immediately; the thread persists it with crash-safe atomic-rename
// semantics (write *.tmp, fsync, rename, fsync dir).
//
// Buffering is latest-wins double-buffer: if a write is still in flight
// when the next snapshot arrives, the pending (not-yet-started) snapshot is
// replaced — for checkpoints only the most recent state matters, and the
// trainer never blocks or accumulates unbounded memory.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <string>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Snapshot {
  std::vector<uint8_t> state;
  std::string config;  // empty = no config.json update
  int64_t seq = -1;
};

struct Writer {
  std::string dir;
  std::thread thread;
  std::mutex mu;
  std::condition_variable cv;       // signals: pending set or stopping
  std::condition_variable cv_done;  // signals: a write completed
  Snapshot pending;                 // seq >= 0 when a snapshot is queued
  bool stopping = false;
  std::atomic<int64_t> submitted{0};
  std::atomic<int64_t> written{0};
  std::atomic<int64_t> dropped{0};  // latest-wins replacements
  std::atomic<int> error{0};        // sticky errno of first failed write
};

bool write_file_atomic(const std::string& dir, const std::string& name,
                       const void* data, size_t len) {
  const std::string tmp = dir + "/." + name + ".tmp";
  const std::string fin = dir + "/" + name;
  int fd = ::open(tmp.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return false;
  const uint8_t* p = static_cast<const uint8_t*>(data);
  size_t off = 0;
  while (off < len) {
    ssize_t n = ::write(fd, p + off, len - off);
    if (n < 0) {
      if (errno == EINTR) continue;
      ::close(fd);
      ::unlink(tmp.c_str());
      return false;
    }
    off += static_cast<size_t>(n);
  }
  if (::fsync(fd) != 0 || ::close(fd) != 0) {
    ::unlink(tmp.c_str());
    return false;
  }
  if (::rename(tmp.c_str(), fin.c_str()) != 0) {
    ::unlink(tmp.c_str());
    return false;
  }
  int dfd = ::open(dir.c_str(), O_RDONLY | O_DIRECTORY);
  if (dfd >= 0) {
    ::fsync(dfd);
    ::close(dfd);
  }
  return true;
}

void writer_loop(Writer* w) {
  for (;;) {
    Snapshot snap;
    {
      std::unique_lock<std::mutex> lk(w->mu);
      w->cv.wait(lk, [w] { return w->pending.seq >= 0 || w->stopping; });
      if (w->pending.seq < 0 && w->stopping) return;
      snap = std::move(w->pending);
      w->pending = Snapshot{};
    }
    bool ok = write_file_atomic(w->dir, "state.msgpack", snap.state.data(),
                                snap.state.size());
    if (ok && !snap.config.empty())
      ok = write_file_atomic(w->dir, "config.json", snap.config.data(),
                             snap.config.size());
    if (!ok) {
      int e = errno ? errno : -1;
      int expected = 0;
      w->error.compare_exchange_strong(expected, e);
    }
    {
      // increment + notify under the lock so a concurrent mmw_flush cannot
      // check its predicate between the two and miss the wakeup
      std::lock_guard<std::mutex> lk(w->mu);
      w->written.fetch_add(1);
      w->cv_done.notify_all();
    }
  }
}

}  // namespace

extern "C" {

void* mmw_open(const char* dir) {
  if (::mkdir(dir, 0755) != 0 && errno != EEXIST) return nullptr;
  Writer* w = new Writer();
  w->dir = dir;
  w->thread = std::thread(writer_loop, w);
  return w;
}

// Queue a snapshot; returns the sequence number (>=0), never blocks on IO.
// A still-queued older snapshot is replaced (latest wins).
int64_t mmw_submit(void* h, const uint8_t* state, int64_t state_len,
                   const char* config_json) {
  Writer* w = static_cast<Writer*>(h);
  int64_t seq = w->submitted.fetch_add(1);
  std::lock_guard<std::mutex> lk(w->mu);
  if (w->pending.seq >= 0) w->dropped.fetch_add(1);
  w->pending.state.assign(state, state + state_len);
  w->pending.config = config_json ? config_json : "";
  w->pending.seq = seq;
  w->cv.notify_one();
  return seq;
}

// Block until every queued snapshot has been persisted (the pending slot is
// empty AND no write is in flight).  Returns 0, or the sticky errno of the
// first failed write.
int mmw_flush(void* h) {
  Writer* w = static_cast<Writer*>(h);
  std::unique_lock<std::mutex> lk(w->mu);
  w->cv_done.wait(lk, [w] {
    return w->pending.seq < 0 &&
           w->written.load() == w->submitted.load() - w->dropped.load();
  });
  return w->error.load();
}

int64_t mmw_written(void* h) {
  return static_cast<Writer*>(h)->written.load();
}

int64_t mmw_dropped(void* h) {
  return static_cast<Writer*>(h)->dropped.load();
}

void mmw_close(void* h) {
  Writer* w = static_cast<Writer*>(h);
  {
    std::lock_guard<std::mutex> lk(w->mu);
    w->stopping = true;
    w->cv.notify_one();
  }
  w->thread.join();
  delete w;
}

}  // extern "C"
