"""Input layer (reference: core/input*.{c,h,m} — GLFW keyboard,
joystick with per-pad bindings, browser, fuzzer; unified into
struct message_input, messagebus.h:33-89).

Host-side: raw key/axis events → an InputRecord (the message_input
analogue) → engine Inputs via binding tables. The fuzzer
(engine/fuzzer.py) and replay files produce the same records, so every
input source is interchangeable, like the reference's MT_INPUT bus.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..char.motion import camera_yaw_quat, motion_compute_ls, motion_get
from .step import Inputs


@dataclass
class InputRecord:
    """The relevant subset of struct message_input (messagebus.h:33-89)."""

    left: bool = False
    right: bool = False
    up: bool = False
    down: bool = False
    delta_lx: float = 0.0
    delta_ly: float = 0.0
    pitch_up: bool = False
    pitch_down: bool = False
    yaw_left: bool = False
    yaw_right: bool = False
    delta_rx: float = 0.0
    delta_ry: float = 0.0
    space: bool = False      # jump
    shift: bool = False      # dash (character.c:12-67)
    tab: bool = False        # character switch
    zoom: float = 0.0
    pause: bool = False
    menu_toggle: bool = False
    edit_toggle: bool = False  # scene editor (scene.c:174-304)
    enter: bool = False      # menu activate
    mouse_x: float | None = None   # pointer position (UI hover/click)
    mouse_y: float | None = None
    mouse_click: bool = False


# default keyboard bindings (input-keyboard.c key → record field)
KEY_BINDINGS = {
    "w": "up", "s": "down", "a": "left", "d": "right",
    "up": "pitch_up", "down": "pitch_down",
    "left": "yaw_left", "right": "yaw_right",
    "space": "space", "shift": "shift", "tab": "tab",
    "escape": "menu_toggle", "enter": "enter", "f1": "edit_toggle",
}

# joystick axis/button bindings (input-joystick.c per-pad tables)
PAD_BINDINGS = {
    "axis0": "delta_lx", "axis1": "delta_ly",
    "axis2": "delta_rx", "axis3": "delta_ry",
    "button0": "space", "button4": "tab",
}


def apply_key(rec: InputRecord, key: str, pressed: bool) -> InputRecord:
    f = KEY_BINDINGS.get(key)
    if f:
        setattr(rec, f, pressed)
    return rec


def apply_axis(rec: InputRecord, axis: str, value: float) -> InputRecord:
    f = PAD_BINDINGS.get(axis)
    if f:
        setattr(rec, f, value)
    return rec


def record_to_inputs(rec: InputRecord, cam_yaw, lin_speed=1.0,
                     n_chars: int = 1) -> Inputs:
    """InputRecord → device Inputs: stick merge + camera-relative motion
    (motion_compute, motion.c:115-120) + camera deltas."""
    ls_dx, ls_dy = motion_compute_ls(rec.left, rec.right, rec.up, rec.down,
                                     rec.delta_lx, rec.delta_ly)
    q = camera_yaw_quat(jnp.asarray(cam_yaw, jnp.float32))
    dx, dz = motion_get(ls_dx, ls_dy, q, jnp.float32(lin_speed))
    motion = jnp.zeros((n_chars, 2), jnp.float32).at[0].set(
        jnp.stack([dx, dz]))
    jump = jnp.zeros((n_chars,), bool).at[0].set(bool(rec.space))
    dash = jnp.zeros((n_chars,), bool).at[0].set(bool(rec.shift))
    pitch_d = (float(rec.pitch_down) - float(rec.pitch_up)) * 0.03 \
        + rec.delta_ry * 0.01
    yaw_d = (float(rec.yaw_right) - float(rec.yaw_left)) * 0.05 \
        + rec.delta_rx * 0.01
    cam = jnp.array([pitch_d, yaw_d, rec.zoom], jnp.float32)
    # dash always populated: a None leaf changes the Inputs treedef vs
    # inputs_zero and forces a second jit specialization of the step
    return Inputs(motion=motion, jump=jump, cam_delta=cam, dash=dash)
