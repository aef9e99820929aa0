// Keccak-256 (pre-NIST padding 0x01, rate 136) — the Ethereum hash.
//
// Native host-side core for the Fiat–Shamir transcript and protocol secret
// derivation.  The reference uses Rust `keccak`/alloy for the same roles
// (transcript squeeze: crates/halo2-verifier/templates/Halo2Verifier.sol:104-121;
// secrets: crates/shielder-account/src/secrets.rs); this is an independent
// implementation of FIPS-202 Keccak-f[1600] with the legacy 0x01 domain pad.
//
// Build: g++ -O2 -shared -fPIC -o libzkkeccak.so keccak.cc
// ABI (ctypes):
//   void zk_keccak256(const uint8_t* in, size_t len, uint8_t out[32]);
//   void zk_keccak256_batch(const uint8_t* in, size_t stride, size_t n,
//                           size_t len, uint8_t* out);  // n msgs, 32B each out

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr int kRounds = 24;

constexpr uint64_t kRC[kRounds] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

inline uint64_t rotl(uint64_t x, int s) { return (x << s) | (x >> (64 - s)); }

void keccak_f(uint64_t st[25]) {
  uint64_t bc[5], t;
  for (int round = 0; round < kRounds; ++round) {
    // theta
    for (int i = 0; i < 5; ++i)
      bc[i] = st[i] ^ st[i + 5] ^ st[i + 10] ^ st[i + 15] ^ st[i + 20];
    for (int i = 0; i < 5; ++i) {
      t = bc[(i + 4) % 5] ^ rotl(bc[(i + 1) % 5], 1);
      for (int j = 0; j < 25; j += 5) st[j + i] ^= t;
    }
    // rho + pi
    static constexpr int kPi[24] = {10, 7,  11, 17, 18, 3,  5,  16,
                                    8,  21, 24, 4,  15, 23, 19, 13,
                                    12, 2,  20, 14, 22, 9,  6,  1};
    static constexpr int kRot[24] = {1,  3,  6,  10, 15, 21, 28, 36,
                                     45, 55, 2,  14, 27, 41, 56, 8,
                                     25, 43, 62, 18, 39, 61, 20, 44};
    t = st[1];
    for (int i = 0; i < 24; ++i) {
      int j = kPi[i];
      bc[0] = st[j];
      st[j] = rotl(t, kRot[i]);
      t = bc[0];
    }
    // chi
    for (int j = 0; j < 25; j += 5) {
      for (int i = 0; i < 5; ++i) bc[i] = st[j + i];
      for (int i = 0; i < 5; ++i)
        st[j + i] = bc[i] ^ (~bc[(i + 1) % 5] & bc[(i + 2) % 5]);
    }
    // iota
    st[0] ^= kRC[round];
  }
}

constexpr size_t kRate = 136;  // Keccak-256

void keccak256_one(const uint8_t* in, size_t len, uint8_t out[32]) {
  uint64_t st[25];
  std::memset(st, 0, sizeof(st));
  uint8_t* bytes = reinterpret_cast<uint8_t*>(st);  // little-endian host assumed
  while (len >= kRate) {
    for (size_t i = 0; i < kRate; ++i) bytes[i] ^= in[i];
    keccak_f(st);
    in += kRate;
    len -= kRate;
  }
  for (size_t i = 0; i < len; ++i) bytes[i] ^= in[i];
  bytes[len] ^= 0x01;       // Keccak (legacy) domain padding
  bytes[kRate - 1] ^= 0x80;
  keccak_f(st);
  std::memcpy(out, bytes, 32);
}

}  // namespace

extern "C" {

void zk_keccak256(const uint8_t* in, size_t len, uint8_t out[32]) {
  keccak256_one(in, len, out);
}

void zk_keccak256_batch(const uint8_t* in, size_t stride, size_t n, size_t len,
                        uint8_t* out) {
  for (size_t i = 0; i < n; ++i)
    keccak256_one(in + i * stride, len, out + i * 32);
}

}  // extern "C"
