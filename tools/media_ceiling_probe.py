"""Audio/video codec throughput ceilings — the JPEG-ceiling twin for
the two most expensive gate queries (`audio_near_dups`,
`video_mjpeg_frames`). Both operators are linear codec passes in
Arrow-batched mapInPandas with no shuffle, so the single honest
scale number is the per-core constant; this probe measures it
single-core on warm loops, with NO Spark in the timed region.

Measured:
1. audio fingerprints/s/core — `_parse_wav` + the rFFT dominant-bin
   trajectory (the exact `audio_fingerprint` per-payload body) over
   a gate-shaped 57-window stepped-tone WAV (~57 KB mono 16-bit).
2. WAV parse alone (header + frombuffer) — shows the FFT share.
3. MJPEG frames/s/core — `demux_avi_mjpeg` + `decode_jpeg` over a
   gate-shaped AVI (tiny 12-20 px frames: fixed per-frame cost
   dominates) AND over a 320x240 frame (pixel-bound regime, for the
   MP/s/core constant comparable to the round-8 JPEG ceiling).

Usage: python tools/media_ceiling_probe.py
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from amaxa_spark.operators import multimodal as MM


def synth_wav(doc: int) -> bytes:
    """The gate's stepped-tone WAV (synthesize_chirp_wav_pairs
    formula), built standalone: 57 full 512-sample windows of pure
    sines, mono 16-bit PCM, 8 kHz."""
    W, NW = MM._FP_WINDOW, MM._FP_WINDOWS
    i = np.arange(W, dtype=np.float64)
    base = (doc // 2) * 2654435761 + 101
    chunks = []
    for w in range(NW):
        k = 5 + (base // (w + 1)) % 200
        chunks.append(np.sin(2 * np.pi * k * i / W))
    samples = (np.concatenate(chunks) * 12000).astype("<i2")
    pcm = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def fingerprint(payload: bytes) -> int:
    """The audio_fingerprint per-payload body, verbatim."""
    W, NW = MM._FP_WINDOW, MM._FP_WINDOWS
    half = W // 2
    parsed = MM._parse_wav(payload)
    samples = np.frombuffer(parsed[4], dtype="<i2").astype(np.float64)
    frames = samples[: NW * W].reshape(NW, W)
    mags = np.abs(np.fft.rfft(frames, axis=1))[:, 1 : half + 1]
    bins = mags.argmax(axis=1) + 1
    out = 0
    for w in range(NW - 1):
        if bins[w] > bins[w + 1]:
            out |= 1 << w
    return out


def timed_loop(fn, n_warm=20, budget_s=3.0):
    for _ in range(n_warm):
        fn()
    n, t0 = 0, time.time()
    while time.time() - t0 < budget_s:
        fn()
        n += 1
    return n / (time.time() - t0)


def main() -> None:
    out = {}

    wav = synth_wav(42)
    out["wav_bytes"] = len(wav)
    out["audio_fp_per_s_core"] = round(timed_loop(lambda: fingerprint(wav)), 1)
    out["wav_parse_per_s_core"] = round(
        timed_loop(lambda: MM._parse_wav(wav)), 1
    )

    # gate-shaped AVI: dims (12+d%9)x(10+d%7), 2+d%4 frames
    d = 7
    frames = [
        MM.encode_jpeg(MM.mjpeg_expected_pixels(d, f)) for f in range(2 + d % 4)
    ]
    n_frames = len(frames)
    w, h = 12 + d % 9, 10 + d % 7

    def decode_gate_avi():
        for fr in frames:
            MM.decode_jpeg(fr)

    fps_small = timed_loop(decode_gate_avi, budget_s=3.0) * n_frames
    out["gate_frame_dims"] = f"{w}x{h}"
    out["gate_frames_per_s_core"] = round(fps_small, 1)

    # pixel-bound regime: one 320x240 smooth frame
    yy, xx = np.mgrid[0:240, 0:320]
    px = np.stack(
        [(xx * 255 // 320), (yy * 255 // 240), ((xx + yy) % 256)], axis=-1
    ).astype(np.uint8)
    big = MM.encode_jpeg(px)
    fps_big = timed_loop(lambda: MM.decode_jpeg(big), n_warm=3, budget_s=5.0)
    out["big_frame_bytes"] = len(big)
    out["big_frames_per_s_core"] = round(fps_big, 2)
    out["big_mp_per_s_core"] = round(fps_big * 320 * 240 / 1e6, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
