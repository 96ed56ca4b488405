// diffbir_tpu native data loader.
//
// TPU-native equivalent of the torch DataLoader C++ worker pool the
// reference leans on (train_stage1.py/train_stage2.py wrap datasets in
// torch.utils.data.DataLoader with num_workers): a thread pool decodes
// images (OpenCV imdecode: JPEG/PNG/WebP/BMP), resizes the short edge if
// the crop does not fit, takes a random or center crop, optionally applies
// hflip/rot90 augmentation, and pushes fixed-shape uint8 RGB batches into a
// bounded queue. The host thread (Python, via ctypes) pops complete batches
// and hands them to jax.device_put — decode/augment never blocks the TPU
// step.
//
// Determinism: a worker claims a CONTIGUOUS range of sample slots plus a
// batch sequence number under one lock, every sample draws from its own
// splitmix64 stream seeded with (seed, epoch, file index), and finished
// batches are delivered strictly in sequence order — so the byte stream is
// fully independent of thread scheduling. Epoch shuffling is a seeded
// Fisher-Yates over the file list (drop-last semantics, like torch
// DataLoader(drop_last=True)).
//
// C ABI (see native_loader.py):
//   void* dl_create(const char** paths, int n_files, int batch, int size,
//                   int crop_mode, int augment, int n_threads,
//                   int queue_depth, unsigned long long seed);
//   int   dl_next(void* h, unsigned char* out);   // [batch,size,size,3]
//   int   dl_next_idx(void* h, unsigned char* out, long* idx_out);
//   long  dl_n_files(void* h);
//   long  dl_batches_per_epoch(void* h);
//   void  dl_destroy(void* h);
//
// crop_mode: 0 = center with scale-to-fit (short edge -> size, like
// dataset/utils.py center_crop_arr), 1 = random crop at native scale,
// 2 = random zoom-crop (short edge -> size/frac, frac ~ U(0.7, 1), then
// random crop — like random_crop_arr(min_crop_frac=0.7)).
// augment: bitmask 1 = hflip, 2 = rot90.

#include <condition_variable>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct SplitMix64 {
  unsigned long long s;
  explicit SplitMix64(unsigned long long seed) : s(seed) {}
  unsigned long long next() {
    unsigned long long z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  // unbiased-enough bounded draw for crop offsets / shuffles
  unsigned long long bounded(unsigned long long n) { return n ? next() % n : 0; }
};

struct Batch {
  std::vector<unsigned char> data;  // batch*size*size*3
  std::vector<long> idx;            // file index per sample (prompt lookup)
};

class Loader {
 public:
  Loader(std::vector<std::string> paths, int batch, int size, int crop_mode,
         int augment, int n_threads, int queue_depth, unsigned long long seed,
         bool shuffle)
      : paths_(std::move(paths)),
        batch_(batch),
        size_(size),
        crop_mode_(crop_mode),
        augment_(augment),
        queue_depth_(queue_depth),
        seed_(seed),
        shuffle_(shuffle),
        order_(paths_.size()) {
    for (size_t i = 0; i < order_.size(); ++i) order_[i] = i;
    shuffle_epoch(0);
    int nt = n_threads > 0 ? n_threads : 4;
    for (int t = 0; t < nt; ++t)
      workers_.emplace_back([this] { work(); });
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_free_.notify_all();
    cv_ready_.notify_all();
    for (auto& w : workers_) w.join();
  }

  long n_files() const { return static_cast<long>(paths_.size()); }
  long batches_per_epoch() const {
    return static_cast<long>(paths_.size() / batch_);
  }

  // Blocks until the NEXT in-sequence batch is ready; returns 0 on success.
  // idx_out (optional) receives the batch_ file indices.
  int next(unsigned char* out, long* idx_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_ready_.wait(lk, [this] {
      return ready_.count(next_out_) != 0 || stop_;
    });
    if (stop_ && ready_.count(next_out_) == 0) return -1;
    Batch b = std::move(ready_[next_out_]);
    ready_.erase(next_out_);
    ++next_out_;
    lk.unlock();
    cv_free_.notify_all();
    std::memcpy(out, b.data.data(), b.data.size());
    if (idx_out)
      std::memcpy(idx_out, b.idx.data(), b.idx.size() * sizeof(long));
    return 0;
  }

 private:
  void shuffle_epoch(unsigned long long epoch) {
    if (!shuffle_) return;  // deterministic in-order epochs (val iterators)
    SplitMix64 rng(seed_ * 0x2545F4914F6CDD1DULL + epoch + 1);
    for (size_t i = order_.size(); i > 1; --i) {
      size_t j = rng.bounded(i);
      std::swap(order_[i - 1], order_[j]);
    }
  }

  // Claim a contiguous range of batch_ sample slots plus the batch sequence
  // number under one lock; handles epoch rollover (drop-last) + reshuffle.
  void claim_batch(std::vector<size_t>* slots, unsigned long long* epoch_out,
                   unsigned long long* seq_out) {
    std::lock_guard<std::mutex> lk(order_mu_);
    if (cursor_ + batch_ > order_.size()) {
      cursor_ = 0;
      ++epoch_;
      shuffle_epoch(epoch_);
    }
    *epoch_out = epoch_;
    *seq_out = next_seq_++;
    slots->resize(batch_);
    for (int i = 0; i < batch_; ++i)  // modulo guards n_files < batch
      (*slots)[i] = order_[(cursor_ + i) % order_.size()];
    cursor_ += batch_;
  }

  void decode_one(size_t file_idx, unsigned long long epoch,
                  unsigned char* dst) {
    SplitMix64 rng((seed_ ^ 0x9e3779b97f4a7c15ULL) + epoch * 1000003ULL +
                   file_idx * 0x100000001b3ULL);
    cv::Mat img = cv::imread(paths_[file_idx], cv::IMREAD_COLOR);
    if (img.empty()) {  // unreadable file -> zero sample (never crash training)
      std::memset(dst, 0, static_cast<size_t>(size_) * size_ * 3);
      return;
    }
    int short_edge = std::min(img.rows, img.cols);
    double target_short = size_;
    if (img.rows == size_ && img.cols == size_) {
      // Exact-size images pass through unscaled and uncropped. This is
      // parity with the reference DATASET wrappers, which short-circuit
      // out_size inputs before any crop fn runs (reference
      // diffbir/dataset/codeformer.py:65-72, realesrgan.py:112-115) — the
      // zoom aug in random_crop_arr is only reached for non-exact sizes.
      target_short = short_edge;
    } else if (crop_mode_ == 0) {
      target_short = size_;  // scale-to-fit: crop spans the full short edge
    } else if (crop_mode_ == 2) {
      double frac = 0.7 + 0.3 * (rng.next() >> 11) * (1.0 / (1ULL << 53));
      target_short = size_ / frac;
    } else {
      target_short = short_edge >= size_ ? short_edge : size_;
    }
    if (std::lround(target_short) != short_edge) {
      double scale = target_short / short_edge;
      cv::resize(img, img,
                 cv::Size(std::max(size_, (int)std::lround(img.cols * scale)),
                          std::max(size_, (int)std::lround(img.rows * scale))),
                 0, 0, scale < 1.0 ? cv::INTER_AREA : cv::INTER_CUBIC);
    }
    int max_y = img.rows - size_, max_x = img.cols - size_;
    int y, x;
    if (crop_mode_ == 0) {
      y = max_y / 2;
      x = max_x / 2;
    } else {
      y = static_cast<int>(rng.bounded(max_y + 1));
      x = static_cast<int>(rng.bounded(max_x + 1));
    }
    cv::Mat crop = img(cv::Rect(x, y, size_, size_));
    if (augment_ & 1 && (rng.next() & 1)) cv::flip(crop, crop, 1);
    if (augment_ & 2) {
      int k = static_cast<int>(rng.bounded(4));
      if (k == 1) cv::rotate(crop, crop, cv::ROTATE_90_CLOCKWISE);
      if (k == 2) cv::rotate(crop, crop, cv::ROTATE_180);
      if (k == 3) cv::rotate(crop, crop, cv::ROTATE_90_COUNTERCLOCKWISE);
    }
    cv::Mat rgb;
    cv::cvtColor(crop, rgb, cv::COLOR_BGR2RGB);
    if (!rgb.isContinuous()) rgb = rgb.clone();
    std::memcpy(dst, rgb.data, static_cast<size_t>(size_) * size_ * 3);
  }

  void work() {
    const size_t sample_bytes = static_cast<size_t>(size_) * size_ * 3;
    while (true) {
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_free_.wait(lk, [this] {
          return stop_ || ready_.size() + in_flight_ <
                              static_cast<size_t>(queue_depth_);
        });
        if (stop_) return;
        ++in_flight_;
      }
      std::vector<size_t> slots;
      unsigned long long epoch, seq;
      claim_batch(&slots, &epoch, &seq);
      Batch b;
      b.data.resize(sample_bytes * batch_);
      b.idx.assign(slots.begin(), slots.end());
      for (int i = 0; i < batch_; ++i)
        decode_one(slots[i], epoch, b.data.data() + sample_bytes * i);
      {
        std::lock_guard<std::mutex> lk(mu_);
        --in_flight_;
        ready_.emplace(seq, std::move(b));
      }
      cv_ready_.notify_all();
    }
  }

  std::vector<std::string> paths_;
  int batch_, size_, crop_mode_, augment_, queue_depth_;
  unsigned long long seed_;
  bool shuffle_ = true;

  std::mutex order_mu_;
  std::vector<size_t> order_;
  size_t cursor_ = 0;
  unsigned long long epoch_ = 0;
  unsigned long long next_seq_ = 0;

  std::mutex mu_;
  std::condition_variable cv_ready_, cv_free_;
  std::map<unsigned long long, Batch> ready_;  // seq -> batch (in-order out)
  unsigned long long next_out_ = 0;
  size_t in_flight_ = 0;
  bool stop_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* dl_create(const char** paths, int n_files, int batch, int size,
                int crop_mode, int augment, int n_threads, int queue_depth,
                unsigned long long seed, int shuffle) {
  if (n_files <= 0 || batch <= 0 || size <= 0) return nullptr;
  std::vector<std::string> p(paths, paths + n_files);
  return new Loader(std::move(p), batch, size, crop_mode, augment, n_threads,
                    queue_depth > 0 ? queue_depth : 4, seed, shuffle != 0);
}

int dl_api_version() { return 2; }

int dl_next(void* h, unsigned char* out) {
  return static_cast<Loader*>(h)->next(out, nullptr);
}

int dl_next_idx(void* h, unsigned char* out, long* idx_out) {
  return static_cast<Loader*>(h)->next(out, idx_out);
}

long dl_n_files(void* h) { return static_cast<Loader*>(h)->n_files(); }

long dl_batches_per_epoch(void* h) {
  return static_cast<Loader*>(h)->batches_per_epoch();
}

void dl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
