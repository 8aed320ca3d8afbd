"""Debug UI module registry (reference: core/ui-debug.{c,h} +
ui-imgui*.c — ImGui debug modules with enable/unfold state persisted to
settings, clap.c:545 ui_debug_set_settings).

Headless analogue: named modules contribute key/value panels rendered
through the quad/text UI layer; enable state persists via Settings. The
reference's ImGui widgets (scene params, lights, camera, frusta,
physics) register the same way.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .ui import AF, UiElement


@dataclass
class DebugModule:
    name: str
    collect: Callable[[], dict]    # returns key → value to display
    enabled: bool = False
    unfolded: bool = True


@dataclass
class DebugUI:
    settings: object = None        # utils.settings.Settings or None
    modules: dict = field(default_factory=dict)

    def register(self, name: str, collect: Callable[[], dict]) -> DebugModule:
        m = DebugModule(name=name, collect=collect)
        if self.settings is not None:
            m.enabled = bool(self.settings.get(f"debug.{name}.enabled", False))
            m.unfolded = bool(self.settings.get(f"debug.{name}.unfolded", True))
        self.modules[name] = m
        return m

    def toggle(self, name: str, enabled: bool | None = None) -> None:
        m = self.modules[name]
        m.enabled = (not m.enabled) if enabled is None else enabled
        if self.settings is not None:
            self.settings.set(f"debug.{name}.enabled", m.enabled)

    def build_elements(self) -> list:
        """UI elements for all enabled modules (one panel per module,
        stacked down the left edge like the reference's debug column)."""
        els = []
        yoff = 8.0
        for m in self.modules.values():
            if not m.enabled:
                continue
            lines = [m.name.upper()]
            if m.unfolded:
                for k, v in m.collect().items():
                    if isinstance(v, float):
                        v = round(v, 3)
                    lines.append(f"{k}: {v}")
            for li, line in enumerate(lines):
                els.append(UiElement(text=line, text_scale=1,
                                     affinity=AF.LEFT | AF.TOP,
                                     x=8, y=yoff,
                                     color=(0.05, 0.05, 0.1, 0.5)))
                yoff += 16.0
            yoff += 8.0
        return els


def standard_modules(dui: DebugUI, engine) -> None:
    """Register the reference's stock debug modules (scene/camera/
    physics/memory counters — scene.c:174-391, clap.c:652-657)."""
    dui.register("fps", lambda: engine.profiler.report())
    dui.register("frame", lambda: {"frame": engine.frame_no})

    def phys():
        import numpy as np

        p = np.asarray(engine.state.phys.pos)
        return {"bodies": p.shape[0],
                "char_y": float(p[0, 1]) if p.shape[0] else 0.0}

    dui.register("physics", phys)
