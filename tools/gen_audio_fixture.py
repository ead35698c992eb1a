"""Generate WAV (RIFF PCM) fixtures + independent expected values for
graft.media.Wav and the audio feature queries: deterministic integer
waveforms are synthesized in pure Python, framed as RIFF by hand (no wave
module — the writer itself is part of the twin), and the expected per-file
features (frames, duration_us, peak, energy, zero crossings, pcm sha) and
per-20ms-window features (channel 0) are computed from the SAME sample
arrays before framing, so the JVM decode path is differentially verified
against values that never touched a WAV parser.

aud_02 carries a LIST metadata chunk (with odd length, exercising the
word-alignment rule) between fmt and data; aud_03 is 8-bit PCM and must be
REJECTED by the decoder (used by the spec, excluded from the queries'
glob via its .wav8 suffix).

Outputs: src/test/resources/media/audio/aud_*.wav (+ aud_03.wav8)
         src/test/resources/expected/audio_features.parquet
         src/test/resources/expected/audio_windows.parquet
"""
import hashlib
import math
import os
import struct

OUTDIR = 'src/test/resources/media/audio'
EXP_FEAT = 'src/test/resources/expected/audio_features.parquet'
EXP_WIN = 'src/test/resources/expected/audio_windows.parquet'
EXP_RS = 'src/test/resources/expected/audio_resample.parquet'


def riff(channels, rate, samples, extra_chunks=(), bits=16):
    data = b''.join(struct.pack('<h' if bits == 16 else '<b', s) for s in samples)
    block = channels * bits // 8
    fmt = struct.pack('<HHIIHH', 1, channels, rate, rate * block, block, bits)
    chunks = bytearray()
    chunks += b'fmt ' + struct.pack('<I', len(fmt)) + fmt
    for cid, payload in extra_chunks:
        chunks += cid + struct.pack('<I', len(payload)) + payload
        if len(payload) % 2:
            chunks += b'\x00'  # word alignment pad
    chunks += b'data' + struct.pack('<I', len(data)) + data
    return b'RIFF' + struct.pack('<I', 4 + len(chunks)) + b'WAVE' + bytes(chunks)


def sine(rate, secs, freq, amp):
    n = int(rate * secs)
    return [round(amp * math.sin(2 * math.pi * freq * i / rate)) for i in range(n)]


def saw(rate, secs, freq, amp):
    n = int(rate * secs)
    per = rate / freq
    return [round(amp * (2 * ((i / per) % 1.0) - 1)) for i in range(n)]


def pseudo(rate, secs):
    n = int(rate * secs)
    return [((i * 2654435761) % 40961) - 20480 for i in range(n)]


def interleave(*chans):
    out = []
    for fr in zip(*chans):
        out.extend(fr)
    return out


def features(name, channels, rate, samples):
    frames = len(samples) // channels
    peak = max(abs(s) for s in samples)
    energy = sum(s * s for s in samples)
    ch0 = samples[0::channels]
    zc = sum(1 for i in range(1, len(ch0)) if ch0[i - 1] * ch0[i] < 0)
    pcm = b''.join(struct.pack('<h', s) for s in samples)
    return dict(name=name, channels=channels, sample_rate=rate, frames=frames,
                duration_us=frames * 1000000 // rate, peak=peak, energy=energy,
                zero_crossings=zc, pcm_sha=hashlib.sha256(pcm).hexdigest())


def windows(name, channels, rate, samples):
    ch0 = samples[0::channels]
    win = rate // 50  # 20 ms
    rows = []
    for wi in range(len(ch0) // win):
        seg = ch0[wi * win:(wi + 1) * win]
        zc = sum(1 for i in range(1, len(seg)) if seg[i - 1] * seg[i] < 0)
        rows.append(dict(name=name, win_idx=wi, n_frames=win,
                         energy=sum(s * s for s in seg), zero_crossings=zc))
    return rows


def quiet(rate, secs):
    # deterministic low-amplitude noise floor (|s| <= 80: far below the
    # VAD threshold's 500-RMS line)
    n = int(rate * secs)
    return [((i * 2654435761) % 161) - 80 for i in range(n)]


def resample16k(channels, rate, samples):
    """ASR-prep: downmix to mono (round-half-up average: (l+r+1)//2,
    not a plain floor average — ADVICE r5 doc fix) then linear-interpolate
    to 16 kHz with INTEGER arithmetic only — source position num/16000
    stays rational, the lerp rounds half-up via +R2//2, and every
    division floors (Python // ≡ Java Math.floorDiv, exact on negatives).
    rate == 16000 reduces to the identity (frac = 0)."""
    if channels == 2:
        ch = [(samples[2 * i] + samples[2 * i + 1] + 1) // 2
              for i in range(len(samples) // 2)]
    else:
        assert channels == 1
        ch = samples
    r2 = 16000
    n_out = len(ch) * r2 // rate
    out = []
    for j in range(n_out):
        num = j * rate
        i0 = num // r2
        frac = num % r2
        s0 = ch[i0]
        s1 = ch[i0 + 1] if i0 + 1 < len(ch) else ch[-1]
        out.append((s0 * (r2 - frac) + s1 * frac + r2 // 2) // r2)
    return out


def resample_row(name, channels, rate, samples):
    out = resample16k(channels, rate, samples)
    pcm = b''.join(struct.pack('<h', s) for s in out)
    return dict(name=name, src_rate=rate, src_channels=channels,
                out_frames=len(out), out_peak=max(abs(s) for s in out),
                out_energy=sum(s * s for s in out),
                out_sha=hashlib.sha256(pcm).hexdigest())


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    mono = sine(16000, 0.5, 440, 12000)
    left = sine(44100, 0.25, 440, 9000)
    right = saw(44100, 0.25, 220, 9000)
    noisy = pseudo(8000, 0.3)
    # speech-like VAD fixture: bursts separated by a SHORT gap (2 quiet
    # windows — bridged into one segment by the <=2-window hangover) and a
    # LONG gap (6 windows — splits segments), with leading/trailing floor
    speech = (quiet(16000, 0.10) + sine(16000, 0.16, 350, 8000) +
              quiet(16000, 0.04) + sine(16000, 0.10, 500, 6000) +
              quiet(16000, 0.12) + sine(16000, 0.20, 280, 5000) +
              quiet(16000, 0.08))

    files = [
        ('aud_00.wav', 1, 16000, mono, ()),
        ('aud_01.wav', 2, 44100, interleave(left, right), ()),
        ('aud_02.wav', 1, 8000, noisy,
         ((b'LIST', b'INFOISFTgraft synth'),)),  # odd-length chunk: pad rule
        ('aud_04.wav', 1, 16000, speech, ()),
    ]
    feat_rows, win_rows, rs_rows = [], [], []
    for name, ch, rate, samples, extra in files:
        with open(f'{OUTDIR}/{name}', 'wb') as f:
            f.write(riff(ch, rate, samples, extra))
        feat_rows.append(features(name, ch, rate, samples))
        win_rows.extend(windows(name, ch, rate, samples))
        rs_rows.append(resample_row(name, ch, rate, samples))
    # 8-bit PCM: the decoder must REJECT it (spec-only, .wav8 dodges the glob)
    with open(f'{OUTDIR}/aud_03.wav8', 'wb') as f:
        f.write(riff(1, 8000, [0, 10, -10, 100], bits=8))

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    fdf = pd.DataFrame(feat_rows)
    con.execute(
        "CREATE TABLE f AS SELECT name, CAST(channels AS INT) channels, "
        "CAST(sample_rate AS INT) sample_rate, CAST(frames AS BIGINT) frames, "
        "CAST(duration_us AS BIGINT) duration_us, CAST(peak AS INT) peak, "
        "CAST(energy AS BIGINT) energy, CAST(zero_crossings AS BIGINT) zero_crossings, "
        "pcm_sha FROM fdf")
    con.execute(f"COPY f TO '{EXP_FEAT}' (FORMAT PARQUET)")
    wdf = pd.DataFrame(win_rows)
    con.execute(
        "CREATE TABLE w AS SELECT name, CAST(win_idx AS INT) win_idx, "
        "CAST(n_frames AS INT) n_frames, CAST(energy AS BIGINT) energy, "
        "CAST(zero_crossings AS BIGINT) zero_crossings FROM wdf")
    con.execute(f"COPY w TO '{EXP_WIN}' (FORMAT PARQUET)")
    rdf = pd.DataFrame(rs_rows)
    con.execute(
        "CREATE TABLE r AS SELECT name, CAST(src_rate AS INT) src_rate, "
        "CAST(src_channels AS INT) src_channels, CAST(out_frames AS BIGINT) out_frames, "
        "CAST(out_peak AS INT) out_peak, CAST(out_energy AS BIGINT) out_energy, "
        "out_sha FROM rdf")
    con.execute(f"COPY r TO '{EXP_RS}' (FORMAT PARQUET)")
    for r in feat_rows:
        print(r)
    print(f'{len(win_rows)} window rows')


if __name__ == '__main__':
    main()
