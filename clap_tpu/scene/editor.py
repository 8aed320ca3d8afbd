"""In-engine scene editor (reference: core/scene.c:174-304 — the debug
scene editor that live-edits entity transforms — feeding scene_save,
scene.c:1891-1922, which re-serializes the retained JSON DOM).

The TPU-native shape: edits are PURE functions on the EngineState pytree
(entity pos/rot/scale/visible + the rebuilt world matrix for that slot),
selection/mode/step live host-side in the editor object, and `save`
writes the live state back through the retained DOM exactly like the
reference's download/save path. Input routing mirrors the reference's
debug-UI key navigation: the editor consumes message_input records when
active (scene.c editor focus), Tab cycles the selected entity, arrows
nudge along the active axes, enter cycles mode (move → rotate → scale →
visibility), space toggles visibility in visibility mode.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from .. import mathx as mx

MODES = ("move", "rotate", "scale", "visibility")


def edit_entity(state, ei: int, pos=None, rot=None, scale=None,
                visible=None):
    """Pure edit: replace an entity slot's TRS/visibility and rebuild
    its world matrix (default_update's TRS rebuild, model.c:1670-1676,
    applied to one slot)."""
    p = state.pos[ei] if pos is None else jnp.asarray(pos, jnp.float32)
    q = state.rot[ei] if rot is None else jnp.asarray(rot, jnp.float32)
    s = state.scale[ei] if scale is None else jnp.float32(scale)
    m = mx.mat4_compose_trs(p, q, s)
    st = state._replace(
        pos=state.pos.at[ei].set(p),
        rot=state.rot.at[ei].set(q),
        scale=state.scale.at[ei].set(s),
        mx=state.mx.at[ei].set(m))
    if visible is not None:
        st = st._replace(visible=st.visible.at[ei].set(bool(visible)))
    return st


@dataclass
class SceneEditor:
    """Host-side editor session over a LoadedScene + live EngineState."""

    scene: object                    # loader.LoadedScene
    sel: int = 0
    mode_idx: int = 0
    step: float = 0.25
    rot_step: float = np.pi / 12.0
    active: bool = False
    dirty: set = field(default_factory=set)   # edited entity slots

    @property
    def mode(self) -> str:
        return MODES[self.mode_idx]

    @property
    def selected_name(self) -> str:
        names = self.scene.entity_names
        return names[self.sel] if self.sel < len(names) else f"#{self.sel}"

    def select_next(self, delta: int = 1) -> None:
        n = max(len(self.scene.entity_names), 1)
        self.sel = (self.sel + delta) % n

    def nudge(self, state, dx=0.0, dy=0.0, dz=0.0):
        p = state.pos[self.sel] + jnp.array([dx, dy, dz], jnp.float32)
        self.dirty.add(self.sel)
        return edit_entity(state, self.sel, pos=p)

    def rotate_yaw(self, state, dyaw: float):
        dq = mx.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                     jnp.float32(dyaw))
        q = mx.qmul(dq, state.rot[self.sel])
        self.dirty.add(self.sel)
        return edit_entity(state, self.sel, rot=q)

    def rescale(self, state, factor: float):
        self.dirty.add(self.sel)
        return edit_entity(state, self.sel,
                           scale=float(state.scale[self.sel]) * factor)

    def toggle_visible(self, state):
        self.dirty.add(self.sel)
        return edit_entity(state, self.sel,
                           visible=not bool(state.visible[self.sel]))

    def handle_input(self, rec, state):
        """Route one message_input record. Returns (state, consumed)."""
        if getattr(rec, "edit_toggle", False):
            self.active = not self.active
            return state, True
        if not self.active:
            return state, False
        if getattr(rec, "tab", False):
            self.select_next(-1 if getattr(rec, "shift", False) else 1)
            return state, True
        if getattr(rec, "enter", False):
            self.mode_idx = (self.mode_idx + 1) % len(MODES)
            return state, True
        m = self.mode
        dx = (1 if getattr(rec, "right", False) else 0) \
            - (1 if getattr(rec, "left", False) else 0)
        dz = (1 if getattr(rec, "down", False) else 0) \
            - (1 if getattr(rec, "up", False) else 0)
        dy = (1 if getattr(rec, "pitch_up", False) else 0) \
            - (1 if getattr(rec, "pitch_down", False) else 0)
        if m == "move" and (dx or dy or dz):
            return self.nudge(state, dx * self.step, dy * self.step,
                              dz * self.step), True
        if m == "rotate" and dx:
            return self.rotate_yaw(state, dx * self.rot_step), True
        if m == "scale" and dx:
            return self.rescale(state, 1.25 if dx > 0 else 0.8), True
        if m == "visibility" and getattr(rec, "space", False):
            return self.toggle_visible(state), True
        return state, False

    def status(self) -> dict:
        """Debug-UI panel payload (the editor's on-screen readout)."""
        return {"sel": f"{self.sel}:{self.selected_name}",
                "mode": self.mode, "step": self.step,
                "edited": len(self.dirty)}

    def save(self, state) -> str:
        """scene_save with the LIVE state written back (position,
        rotation, scale, platform/visibility state untouched — the
        reference also only serializes transforms)."""
        doc = json.loads(json.dumps(self.scene.doc))
        pos = np.asarray(state.pos)
        rot = np.asarray(state.rot)
        scl = np.asarray(state.scale)
        ei = 0
        for mentry in doc.get("model", []):
            for key in ("entity", "character"):
                for e in mentry.get(key, []):
                    if ei < pos.shape[0]:
                        e["position"] = [float(x) for x in pos[ei]]
                        e["rotation"] = [float(x) for x in rot[ei]]
                        e["scale"] = float(scl[ei])
                    ei += 1
        return json.dumps(doc, indent=2)
