// envhost: a C++ batched CPU environment pool with a C ABI.
//
// This is the TPU-native framework's counterpart of the role EnvPool plays
// in the reference (C++ Atari envs feeding the device learner through an
// XLA bridge, /root/reference/purejaxql/utils/atari_wrapper.py:100-104):
// environments whose dynamics cannot be expressed as XLA programs run on
// the host CPU, stepped in parallel by a persistent worker-thread pool,
// and exchange flat tensors with JAX through jax.pure_callback /
// io_callback (see purejaxql_tpu/envs/hostpool.py).
//
// Design:
//  - one Pool owns N environment instances and a fixed thread team;
//  - step() scatters disjoint env ranges to workers (no locks on the hot
//    path; a generation counter + condition variable coordinates rounds);
//  - envs auto-reset on termination, gymnax-style, so the learner sees an
//    infinite stream;
//  - everything crosses the ABI as flat float32/int32 buffers allocated
//    by the caller (numpy arrays on the Python side).
//
// Environments implemented natively: CartPole-v1 and Acrobot-v1 with the
// same dynamics as the JAX in-graph versions (envs/classic/*.py), so the
// host path can be validated against the device path.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ----------------------------------------------------------------------
// Environment interface
// ----------------------------------------------------------------------
class Env {
 public:
  virtual ~Env() = default;
  virtual void reset(std::mt19937_64& rng, float* obs) = 0;
  // Returns (reward, done); writes next obs (post-auto-reset when done).
  virtual void step(std::mt19937_64& rng, int action, float* obs,
                    float* reward, uint8_t* done) = 0;
  virtual int obs_dim() const = 0;
  virtual int num_actions() const = 0;
  // Logical observation shape (flattened into obs_dim); rank <= 3.
  virtual std::vector<int> obs_shape() const { return {obs_dim()}; }
};

// ----------------------------------------------------------------------
// CartPole-v1 (dynamics mirror envs/classic/cartpole.py)
// ----------------------------------------------------------------------
class CartPole : public Env {
 public:
  void reset(std::mt19937_64& rng, float* obs) override {
    std::uniform_real_distribution<double> d(-0.05, 0.05);
    x_ = d(rng); x_dot_ = d(rng); theta_ = d(rng); theta_dot_ = d(rng);
    t_ = 0;
    write_obs(obs);
  }

  void step(std::mt19937_64& rng, int action, float* obs, float* reward,
            uint8_t* done) override {
    const double gravity = 9.8, masspole = 0.1, total_mass = 1.1;
    const double length = 0.5, polemass_length = 0.05, force_mag = 10.0;
    const double tau = 0.02;
    const double theta_thresh = 12.0 * 2.0 * kPi / 360.0;
    const double x_thresh = 2.4;

    bool prev_done = std::abs(x_) > x_thresh ||
                     std::abs(theta_) > theta_thresh || t_ >= 500;

    double force = action == 1 ? force_mag : -force_mag;
    double costh = std::cos(theta_), sinth = std::sin(theta_);
    double temp =
        (force + polemass_length * theta_dot_ * theta_dot_ * sinth) /
        total_mass;
    double thetaacc =
        (gravity * sinth - costh * temp) /
        (length * (4.0 / 3.0 - masspole * costh * costh / total_mass));
    double xacc = temp - polemass_length * thetaacc * costh / total_mass;

    x_ += tau * x_dot_;
    x_dot_ += tau * xacc;
    theta_ += tau * theta_dot_;
    theta_dot_ += tau * thetaacc;
    ++t_;

    bool terminal = std::abs(x_) > x_thresh ||
                    std::abs(theta_) > theta_thresh || t_ >= 500;
    *reward = prev_done ? 0.0f : 1.0f;
    *done = terminal ? 1 : 0;
    if (terminal) {
      reset(rng, obs);
    } else {
      write_obs(obs);
    }
  }

  int obs_dim() const override { return 4; }
  int num_actions() const override { return 2; }

 private:
  void write_obs(float* obs) const {
    obs[0] = static_cast<float>(x_);
    obs[1] = static_cast<float>(x_dot_);
    obs[2] = static_cast<float>(theta_);
    obs[3] = static_cast<float>(theta_dot_);
  }
  double x_ = 0, x_dot_ = 0, theta_ = 0, theta_dot_ = 0;
  int t_ = 0;
};

// ----------------------------------------------------------------------
// Acrobot-v1 (RK4 two-link swing-up, mirrors envs/classic/acrobot.py)
// ----------------------------------------------------------------------
class Acrobot : public Env {
 public:
  void reset(std::mt19937_64& rng, float* obs) override {
    std::uniform_real_distribution<double> d(-0.1, 0.1);
    s_[0] = d(rng); s_[1] = d(rng); s_[2] = d(rng); s_[3] = d(rng);
    t_ = 0;
    write_obs(obs);
  }

  void step(std::mt19937_64& rng, int action, float* obs, float* reward,
            uint8_t* done) override {
    double torque = action - 1.0;  // {-1, 0, 1}
    double aug[5] = {s_[0], s_[1], s_[2], s_[3], torque};
    rk4(aug);
    s_[0] = wrap(aug[0]); s_[1] = wrap(aug[1]);
    s_[2] = std::clamp(aug[2], -4 * kPi, 4 * kPi);
    s_[3] = std::clamp(aug[3], -9 * kPi, 9 * kPi);
    ++t_;

    bool solved = -std::cos(s_[0]) - std::cos(s_[1] + s_[0]) > 1.0;
    bool terminal = solved || t_ >= 500;
    *reward = solved ? 0.0f : -1.0f;
    *done = terminal ? 1 : 0;
    if (terminal) {
      reset(rng, obs);
    } else {
      write_obs(obs);
    }
  }

  int obs_dim() const override { return 6; }
  int num_actions() const override { return 3; }

 private:
  static double wrap(double x) {
    double r = std::fmod(x + kPi, 2 * kPi);
    if (r < 0) r += 2 * kPi;
    return r - kPi;
  }

  static void dsdt(const double* s, double* out) {
    const double m = 1.0, l1 = 1.0, lc = 0.5, I = 1.0, g = 9.8;
    double th1 = s[0], th2 = s[1], dth1 = s[2], dth2 = s[3], a = s[4];
    double d1 = m * lc * lc +
                m * (l1 * l1 + lc * lc + 2 * l1 * lc * std::cos(th2)) + 2 * I;
    double d2 = m * (lc * lc + l1 * lc * std::cos(th2)) + I;
    double phi2 = m * lc * g * std::cos(th1 + th2 - kPi / 2);
    double phi1 = -m * l1 * lc * dth2 * dth2 * std::sin(th2) -
                  2 * m * l1 * lc * dth2 * dth1 * std::sin(th2) +
                  (m * lc + m * l1) * g * std::cos(th1 - kPi / 2) + phi2;
    double ddth2 =
        (a + d2 / d1 * phi1 - m * l1 * lc * dth1 * dth1 * std::sin(th2) -
         phi2) /
        (m * lc * lc + I - d2 * d2 / d1);
    double ddth1 = -(d2 * ddth2 + phi1) / d1;
    out[0] = dth1; out[1] = dth2; out[2] = ddth1; out[3] = ddth2; out[4] = 0;
  }

  static void rk4(double* s) {
    const double dt = 0.2;
    double k1[5], k2[5], k3[5], k4[5], tmp[5];
    dsdt(s, k1);
    for (int i = 0; i < 5; ++i) tmp[i] = s[i] + dt / 2 * k1[i];
    dsdt(tmp, k2);
    for (int i = 0; i < 5; ++i) tmp[i] = s[i] + dt / 2 * k2[i];
    dsdt(tmp, k3);
    for (int i = 0; i < 5; ++i) tmp[i] = s[i] + dt * k3[i];
    dsdt(tmp, k4);
    for (int i = 0; i < 5; ++i)
      s[i] += dt / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i]);
  }

  void write_obs(float* obs) const {
    obs[0] = static_cast<float>(std::cos(s_[0]));
    obs[1] = static_cast<float>(std::sin(s_[0]));
    obs[2] = static_cast<float>(std::cos(s_[1]));
    obs[3] = static_cast<float>(std::sin(s_[1]));
    obs[4] = static_cast<float>(s_[2]);
    obs[5] = static_cast<float>(s_[3]);
  }

  double s_[4] = {0, 0, 0, 0};
  int t_ = 0;
};

// ----------------------------------------------------------------------
// Breakout-MinAtar (game logic mirrors envs/minatar/breakout.py: 10x10
// grid, channels [paddle, ball, trail, brick], 3 actions, strike latch,
// paddle-corner re-aim, wall respawn). A real *game* in the host pool so
// the C++-envs + CNN training path exercises the same architecture the
// reference uses for Atari (pqn_atari.py).
// ----------------------------------------------------------------------
class MinAtarBreakout : public Env {
 public:
  void reset(std::mt19937_64& rng, float* obs) override {
    int start = static_cast<int>(rng() & 1);
    ball_x_ = start == 0 ? 0 : 9;
    dir_ = start == 0 ? 2 : 3;
    ball_y_ = 3;
    pos_ = 4;
    last_x_ = ball_x_;
    last_y_ = ball_y_;
    strike_ = false;
    t_ = 0;
    for (int y = 0; y < 10; ++y)
      for (int x = 0; x < 10; ++x) brick_[y][x] = (y >= 1 && y <= 3) ? 1 : 0;
    write_obs(obs);
  }

  void step(std::mt19937_64& rng, int action, float* obs, float* reward,
            uint8_t* done) override {
    static const int kDx[4] = {-1, 1, 1, -1};
    static const int kDy[4] = {-1, -1, 1, 1};
    static const int kBounceX[4] = {1, 0, 3, 2};
    static const int kBounceY[4] = {3, 2, 1, 0};
    static const int kBounceCorner[4] = {2, 3, 0, 1};

    if (action == 1) pos_ = std::max(0, pos_ - 1);
    if (action == 2) pos_ = std::min(9, pos_ + 1);

    last_x_ = ball_x_;
    last_y_ = ball_y_;
    int nx = ball_x_ + kDx[dir_];
    int ny = ball_y_ + kDy[dir_];
    float r = 0.0f;
    bool terminal = false;

    if (nx < 0 || nx > 9) {
      nx = std::clamp(nx, 0, 9);
      dir_ = kBounceX[dir_];
    }
    if (ny < 0) {
      ny = 0;
      dir_ = kBounceY[dir_];
    }
    bool hit_brick = ny >= 0 && ny <= 9 && brick_[ny][nx] == 1;
    if (hit_brick) {
      if (!strike_) {
        r += 1.0f;
        strike_ = true;
        brick_[ny][nx] = 0;
        dir_ = kBounceY[dir_];
        ny = last_y_;
      }
    } else if (ny == 9) {
      int total = 0;
      for (auto& row : brick_)
        for (int v : row) total += v;
      if (total == 0)
        for (int y = 1; y <= 3; ++y)
          for (int x = 0; x < 10; ++x) brick_[y][x] = 1;
      if (ball_x_ == pos_) {
        dir_ = kBounceY[dir_];
        ny = last_y_;
      } else if (nx == pos_) {
        dir_ = kBounceCorner[dir_];
        ny = last_y_;
      } else {
        terminal = true;
      }
    }
    if (!hit_brick) strike_ = false;

    ball_x_ = nx;
    ball_y_ = ny;
    ++t_;
    terminal = terminal || t_ >= 1000;

    *reward = r;
    *done = terminal ? 1 : 0;
    if (terminal) {
      reset(rng, obs);
    } else {
      write_obs(obs);
    }
  }

  int obs_dim() const override { return 10 * 10 * 4; }
  int num_actions() const override { return 3; }
  std::vector<int> obs_shape() const override { return {10, 10, 4}; }

 private:
  void write_obs(float* obs) const {
    std::memset(obs, 0, sizeof(float) * 400);
    auto at = [&](int y, int x, int c) -> float& {
      return obs[(y * 10 + x) * 4 + c];
    };
    at(9, pos_, 0) = 1.0f;
    at(ball_y_, ball_x_, 1) = 1.0f;
    at(last_y_, last_x_, 2) = 1.0f;
    for (int y = 0; y < 10; ++y)
      for (int x = 0; x < 10; ++x)
        if (brick_[y][x]) at(y, x, 3) = 1.0f;
  }

  int ball_x_ = 0, ball_y_ = 3, dir_ = 2, pos_ = 4;
  int last_x_ = 0, last_y_ = 3;
  bool strike_ = false;
  int t_ = 0;
  int brick_[10][10] = {};
};

std::unique_ptr<Env> make_env(const std::string& name) {
  if (name == "CartPole-v1") return std::make_unique<CartPole>();
  if (name == "Acrobot-v1") return std::make_unique<Acrobot>();
  if (name == "Breakout-MinAtar") return std::make_unique<MinAtarBreakout>();
  return nullptr;
}

// ----------------------------------------------------------------------
// Thread pool stepping disjoint env ranges each round
// ----------------------------------------------------------------------
class Pool {
 public:
  Pool(const std::string& name, int num_envs, int num_threads, uint64_t seed)
      : num_envs_(num_envs),
        num_threads_(std::max(1, std::min(num_threads, num_envs))) {
    for (int i = 0; i < num_envs; ++i) {
      envs_.push_back(make_env(name));
      rngs_.emplace_back(seed + 0x9E3779B97F4A7C15ULL * (i + 1));
    }
    obs_dim_ = envs_[0]->obs_dim();
    num_actions_ = envs_[0]->num_actions();
    obs_shape_ = envs_[0]->obs_shape();
    workers_.reserve(num_threads_);
    for (int w = 0; w < num_threads_; ++w) {
      workers_.emplace_back([this, w] { worker_loop(w); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      shutdown_ = true;
      ++generation_;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  bool valid() const { return envs_[0] != nullptr; }
  int obs_dim() const { return obs_dim_; }
  int num_actions() const { return num_actions_; }
  int num_envs() const { return num_envs_; }
  const std::vector<int>& obs_shape() const { return obs_shape_; }

  void reset(float* obs) {
    run_round([this, obs](int i) {
      envs_[i]->reset(rngs_[i], obs + i * obs_dim_);
    });
  }

  void step(const int32_t* actions, float* obs, float* rewards,
            uint8_t* dones) {
    run_round([this, actions, obs, rewards, dones](int i) {
      envs_[i]->step(rngs_[i], actions[i], obs + i * obs_dim_, rewards + i,
                     dones + i);
    });
  }

 private:
  void run_round(std::function<void(int)> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      task_ = std::move(fn);
      pending_ = num_threads_;
      ++generation_;
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

  void worker_loop(int w) {
    uint64_t seen = 0;
    const int chunk = (num_envs_ + num_threads_ - 1) / num_threads_;
    const int lo = w * chunk;
    const int hi = std::min(num_envs_, lo + chunk);
    for (;;) {
      std::function<void(int)> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [&] { return generation_ != seen; });
        seen = generation_;
        if (shutdown_) return;
        task = task_;
      }
      for (int i = lo; i < hi; ++i) task(i);
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_one();
      }
    }
  }

  int num_envs_;
  int num_threads_;
  int obs_dim_ = 0;
  int num_actions_ = 0;
  std::vector<int> obs_shape_;
  std::vector<std::unique_ptr<Env>> envs_;
  std::vector<std::mt19937_64> rngs_;
  std::vector<std::thread> workers_;

  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  std::function<void(int)> task_;
  uint64_t generation_ = 0;
  int pending_ = 0;
  bool shutdown_ = false;
};

}  // namespace

// ----------------------------------------------------------------------
// C ABI
// ----------------------------------------------------------------------
extern "C" {

void* eh_make(const char* env_name, int num_envs, int num_threads,
              uint64_t seed) {
  // Validate the name before constructing the pool: Pool's constructor
  // queries envs_[0] for its spaces.
  if (!make_env(env_name)) return nullptr;
  auto pool = std::make_unique<Pool>(env_name, num_envs, num_threads, seed);
  return pool.release();
}

void eh_close(void* handle) { delete static_cast<Pool*>(handle); }

int eh_obs_dim(void* handle) { return static_cast<Pool*>(handle)->obs_dim(); }

int eh_num_actions(void* handle) {
  return static_cast<Pool*>(handle)->num_actions();
}

int eh_num_envs(void* handle) {
  return static_cast<Pool*>(handle)->num_envs();
}

int eh_obs_rank(void* handle) {
  return static_cast<int>(static_cast<Pool*>(handle)->obs_shape().size());
}

void eh_obs_shape(void* handle, int32_t* dims) {
  const auto& shape = static_cast<Pool*>(handle)->obs_shape();
  for (size_t i = 0; i < shape.size(); ++i) dims[i] = shape[i];
}

void eh_reset(void* handle, float* obs) {
  static_cast<Pool*>(handle)->reset(obs);
}

void eh_step(void* handle, const int32_t* actions, float* obs, float* rewards,
             uint8_t* dones) {
  static_cast<Pool*>(handle)->step(actions, obs, rewards, dones);
}

}  // extern "C"
