// Native data loader: windowed batch assembly with background prefetch.
//
// The TPU-native runtime counterpart of the reference's torch DataLoader
// (num_workers=8 python processes, data_utils/dataloader_torch.py +
// mesh_dataset.__Worker__): reads a packed binary dataset (see
// probtalk_tpu/data/native_loader.py for the format), builds the stride-6
// window index, and assembles normalized fbhe batches in a double-buffered
// producer thread so the accelerator step never waits on host python.
//
// Exposed as a C ABI for ctypes. Single-header, no external deps.
//
// Build: make -C probtalk_tpu/native

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kMagic = 0x50544C4B44533031ULL;  // "PTLKDS01"

struct ClipMeta {
  int64_t frames;
  int64_t pose_dim;   // normalized fbhe channels
  int64_t aud_dim;
  int32_t speaker;
  int64_t pose_off;   // float offsets into the data blob
  int64_t aud_off;
};

struct Batch {
  std::vector<float> poses;   // B * W * pose_dim
  std::vector<float> aud;     // B * W * aud_dim
  std::vector<int32_t> speaker;
  bool last = false;
};

struct Loader {
  // dataset
  std::vector<float> data;
  std::vector<ClipMeta> clips;
  int64_t pose_dim = 0, aud_dim = 0;
  // config
  int64_t window, stride, batch;
  uint64_t seed;
  bool shuffle;
  // window index
  std::vector<std::pair<int32_t, int32_t>> index;  // (clip, start)
  // producer state
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::vector<Batch> queue;
  size_t queue_cap = 4;
  std::atomic<bool> stop{false};
  bool epoch_done = false;

  ~Loader() {
    stop = true;
    cv_empty.notify_all();
    cv_full.notify_all();
    if (worker.joinable()) worker.join();
  }
};

void produce(Loader* L) {
  std::mt19937_64 rng(L->seed);
  std::vector<int64_t> order(L->index.size());
  for (size_t i = 0; i < order.size(); ++i) order[i] = i;
  if (L->shuffle) std::shuffle(order.begin(), order.end(), rng);

  const int64_t n_batches = (int64_t)order.size() / L->batch;
  for (int64_t b = 0; b < n_batches && !L->stop; ++b) {
    Batch out;
    out.poses.resize(L->batch * L->window * L->pose_dim);
    out.aud.resize(L->batch * L->window * L->aud_dim);
    out.speaker.resize(L->batch);
    for (int64_t i = 0; i < L->batch; ++i) {
      auto [ci, start] = L->index[order[b * L->batch + i]];
      const ClipMeta& c = L->clips[ci];
      int64_t s = start;
      if (L->shuffle && c.frames > L->window) {
        // window jitter within +-stride (mesh_dataset __getitem__ jitter)
        int64_t lo = std::max<int64_t>(s - L->stride + 1, 0);
        int64_t hi = std::min<int64_t>(s + L->stride, c.frames - L->window);
        if (hi > lo) s = lo + (int64_t)(rng() % (uint64_t)(hi - lo + 1));
      }
      std::memcpy(&out.poses[i * L->window * L->pose_dim],
                  &L->data[c.pose_off + s * c.pose_dim],
                  sizeof(float) * L->window * c.pose_dim);
      std::memcpy(&out.aud[i * L->window * L->aud_dim],
                  &L->data[c.aud_off + s * c.aud_dim],
                  sizeof(float) * L->window * c.aud_dim);
      out.speaker[i] = c.speaker;
    }
    out.last = (b == n_batches - 1);
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_full.wait(lk, [L] { return L->queue.size() < L->queue_cap || L->stop; });
    if (L->stop) return;
    L->queue.push_back(std::move(out));
    L->cv_empty.notify_one();
  }
  std::unique_lock<std::mutex> lk(L->mu);
  L->epoch_done = true;
  L->cv_empty.notify_all();
}

}  // namespace

extern "C" {

// Open a packed dataset file. Layout (little-endian):
//   u64 magic | i64 n_clips | i64 pose_dim | i64 aud_dim
//   per clip: i64 frames | i32 speaker
//   then per clip: frames*pose_dim f32, frames*aud_dim f32 (in clip order)
void* ptlk_loader_open(const char* path, int64_t window, int64_t stride,
                       int64_t batch, uint64_t seed, int shuffle) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  uint64_t magic = 0;
  int64_t n_clips = 0, pose_dim = 0, aud_dim = 0;
  if (std::fread(&magic, 8, 1, f) != 1 || magic != kMagic) { std::fclose(f); return nullptr; }
  std::fread(&n_clips, 8, 1, f);
  std::fread(&pose_dim, 8, 1, f);
  std::fread(&aud_dim, 8, 1, f);

  auto* L = new Loader();
  L->pose_dim = pose_dim;
  L->aud_dim = aud_dim;
  L->window = window;
  L->stride = stride;
  L->batch = batch;
  L->seed = seed;
  L->shuffle = shuffle != 0;

  int64_t total_floats = 0;
  L->clips.resize(n_clips);
  for (int64_t i = 0; i < n_clips; ++i) {
    std::fread(&L->clips[i].frames, 8, 1, f);
    std::fread(&L->clips[i].speaker, 4, 1, f);
    L->clips[i].pose_dim = pose_dim;
    L->clips[i].aud_dim = aud_dim;
    L->clips[i].pose_off = total_floats;
    total_floats += L->clips[i].frames * pose_dim;
    L->clips[i].aud_off = total_floats;
    total_floats += L->clips[i].frames * aud_dim;
  }
  L->data.resize(total_floats);
  if (std::fread(L->data.data(), 4, total_floats, f) != (size_t)total_floats) {
    std::fclose(f); delete L; return nullptr;
  }
  std::fclose(f);

  for (int32_t ci = 0; ci < (int32_t)n_clips; ++ci) {
    int64_t frames = L->clips[ci].frames;
    for (int64_t s = 0; s + window <= frames; s += stride)
      L->index.emplace_back(ci, (int32_t)s);
  }
  L->worker = std::thread(produce, L);
  return L;
}

int64_t ptlk_loader_num_batches(void* h) {
  auto* L = static_cast<Loader*>(h);
  return (int64_t)L->index.size() / L->batch;
}

int64_t ptlk_loader_num_windows(void* h) {
  return (int64_t)static_cast<Loader*>(h)->index.size();
}

// Fills caller buffers. Returns 1 on success, 0 when the epoch is exhausted.
int ptlk_loader_next(void* h, float* poses, float* aud, int32_t* speaker) {
  auto* L = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_empty.wait(lk, [L] {
    return !L->queue.empty() || L->epoch_done || L->stop;
  });
  if (L->queue.empty()) return 0;
  Batch b = std::move(L->queue.front());
  L->queue.erase(L->queue.begin());
  L->cv_full.notify_one();
  lk.unlock();
  std::memcpy(poses, b.poses.data(), b.poses.size() * 4);
  std::memcpy(aud, b.aud.data(), b.aud.size() * 4);
  std::memcpy(speaker, b.speaker.data(), b.speaker.size() * 4);
  return 1;
}

void ptlk_loader_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
