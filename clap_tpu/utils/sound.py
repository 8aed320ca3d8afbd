"""Sound engine (reference: core/sound.{c,h} — miniaudio + kissfft:
per-sound gain/loop, effect chains, ogg/vorbis assets).

Audio is host-rim I/O (the reference runs miniaudio on the CPU thread);
this module provides the same capabilities without native deps:

- WAV loading (stdlib) + procedural synthesis (test content — the
  reference's ogg assets aren't in-tree, SURVEY §6)
- a fixed-voice mixer with per-voice gain/loop/pitch (sound.c gain/loop)
- FFT-based effect chain (low-pass / reverb-ish), the kissfft analogue,
  runnable through numpy or jnp.fft on device
"""
from __future__ import annotations

import wave
from dataclasses import dataclass, field

import numpy as np

SAMPLE_RATE = 44100
MAX_VOICES = 16


def load_wav(path) -> np.ndarray:
    with wave.open(str(path), "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[w.getsampwidth()]
        data = np.frombuffer(raw, dtype).astype(np.float32)
        if w.getsampwidth() == 1:
            data = (data - 128.0) / 128.0
        else:
            data = data / float(np.iinfo(dtype).max)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(-1)
    return data


def load_ogg(path_or_bytes) -> np.ndarray:
    """Decode an ogg/vorbis asset to mono float32 (the reference's
    primary sound-asset format, sound.c via stb_vorbis; here bound to
    the system libvorbisfile — utils/ogg.py)."""
    from .ogg import decode_ogg, decode_ogg_bytes

    if isinstance(path_or_bytes, (bytes, bytearray)):
        pcm, _rate = decode_ogg_bytes(bytes(path_or_bytes))
    else:
        pcm, _rate = decode_ogg(str(path_or_bytes))
    return pcm.mean(-1) if pcm.ndim > 1 else pcm


def load_sound(path) -> np.ndarray:
    """Format-dispatching loader (librarian hands sound.c whatever the
    scene references: .ogg or .wav)."""
    p = str(path)
    if p.endswith(".ogg"):
        return load_ogg(p)
    return load_wav(p)


def save_wav(path, data: np.ndarray, rate: int = SAMPLE_RATE) -> None:
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype(np.int16).tobytes())


def synth_tone(freq: float, seconds: float, rate: int = SAMPLE_RATE,
               envelope: bool = True) -> np.ndarray:
    t = np.arange(int(seconds * rate)) / rate
    s = np.sin(2 * np.pi * freq * t).astype(np.float32)
    if envelope:
        s *= np.exp(-3.0 * t).astype(np.float32)
    return s


@dataclass
class Voice:
    sound: int = -1
    pos: float = 0.0
    gain: float = 1.0
    pitch: float = 1.0
    loop: bool = False
    playing: bool = False


@dataclass
class SoundEngine:
    """sound_init/sound_play/... (sound.h API shape)."""

    rate: int = SAMPLE_RATE
    sounds: list = field(default_factory=list)
    voices: list = field(default_factory=lambda: [Voice() for _ in range(MAX_VOICES)])
    master_gain: float = 1.0

    def add_sound(self, data: np.ndarray) -> int:
        self.sounds.append(np.asarray(data, np.float32))
        return len(self.sounds) - 1

    def play(self, sound: int, gain: float = 1.0, loop: bool = False,
             pitch: float = 1.0) -> int:
        for vi, v in enumerate(self.voices):
            if not v.playing:
                self.voices[vi] = Voice(sound=sound, pos=0.0, gain=gain,
                                        pitch=pitch, loop=loop, playing=True)
                return vi
        return -1

    def stop(self, voice: int) -> None:
        if 0 <= voice < MAX_VOICES:
            self.voices[voice].playing = False

    def set_gain(self, voice: int, gain: float) -> None:
        self.voices[voice].gain = gain

    def mix(self, frames: int) -> np.ndarray:
        """Advance all voices and mix ``frames`` samples."""
        out = np.zeros(frames, np.float32)
        for v in self.voices:
            if not v.playing or v.sound < 0:
                continue
            data = self.sounds[v.sound]
            idx = v.pos + np.arange(frames) * v.pitch
            if v.loop:
                idx = np.mod(idx, len(data))
                seg = data[idx.astype(np.int64)]
                v.pos = float(np.mod(v.pos + frames * v.pitch, len(data)))
            else:
                valid = idx < len(data)
                seg = np.where(valid, data[np.minimum(idx, len(data) - 1)
                                           .astype(np.int64)], 0.0)
                v.pos += frames * v.pitch
                if v.pos >= len(data):
                    v.playing = False
            out += seg * v.gain
        return np.clip(out * self.master_gain, -1.0, 1.0)


def lowpass_fft(signal: np.ndarray, cutoff_hz: float,
                rate: int = SAMPLE_RATE) -> np.ndarray:
    """FFT brick-wall low-pass — the kissfft effect-chain analogue
    (runs equally via jnp.fft on device for batched buffers)."""
    spec = np.fft.rfft(signal)
    freqs = np.fft.rfftfreq(len(signal), 1.0 / rate)
    spec = np.where(freqs <= cutoff_hz, spec, 0.0)
    return np.fft.irfft(spec, len(signal)).astype(np.float32)
