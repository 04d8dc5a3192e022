"""Plot harvest for the sandboxed executor (reference A13's other half,
bambooai/code_executor.py:30-76,143-183 — "plots as data", SURVEY §1.1).

The reference captures two figure families after generated code runs:

- matplotlib: every live figure with axes is rendered to PNG and returned as
  ``{"data": <base64>, "format": "png"}`` (code_executor.py:143-156), then
  closed;
- plotly: ``pio.show`` is monkey-patched before exec so ``fig.show()`` writes
  the figure instead of opening a browser; harvested as
  ``{"data": <figure json>, "format": "json"}`` (code_executor.py:49-69,
  158-183).

This module reproduces that contract with in-memory harvest (no temp-file
round-trip — the reference's file indirection existed for its web UI). Both
libraries are OPTIONAL: neither ships in this container, so every touch point
is import-gated and the executor degrades to an empty ``plots`` list. Tests
drive the real code path by installing minimal fakes in ``sys.modules``.

Scale note: figures are driver-side presentation objects produced from
already-bounded data (generated code must ``toPandas()`` a small frame before
plotting — the sanitizer's collect guards bound that). Nothing here touches
executors.
"""

from __future__ import annotations

import base64
import io
from dataclasses import dataclass, field
from typing import Any


@dataclass
class PlotCapture:
    """Live capture state for one ``execute()`` call."""

    plotly_figs: list[Any] = field(default_factory=list)
    _pio: Any = None
    _original_show: Any = None
    _preexisting_fignums: set[int] = field(default_factory=set)

    def close(self) -> None:
        """Restore the patched ``pio.show`` (always runs, error or not)."""
        if self._pio is not None and self._original_show is not None:
            self._pio.show = self._original_show
            self._pio = None
            self._original_show = None


def begin_capture() -> PlotCapture:
    """Arm both harvest hooks before generated code runs.

    matplotlib: force the ``Agg`` backend + interactive-off (reference
    code_executor.py:87-89) and snapshot pre-existing figure numbers so only
    figures the generated code creates are harvested.

    plotly: swap ``pio.show`` for a collector appending the figure object
    (reference patches it to write a json file; same harvest, no file).
    """
    cap = PlotCapture()
    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt  # noqa: PLC0415

        plt.ioff()
        cap._preexisting_fignums = set(plt.get_fignums())
    except ImportError:
        pass
    try:
        import plotly.io as pio  # noqa: PLC0415

        cap._pio = pio
        cap._original_show = pio.show

        def _collect_show(fig, *args, **kwargs):  # noqa: ANN001, ANN002, ANN003
            cap.plotly_figs.append(fig)

        pio.show = _collect_show
    except ImportError:
        pass
    return cap


def harvest(cap: PlotCapture) -> list[dict[str, str]]:
    """Collect figures produced since ``begin_capture`` as plots-as-data.

    Returns reference-shaped dicts: ``{"data": ..., "format": "png"|"json"}``
    (code_executor.py:150-155, 176-180). Matplotlib figures are closed after
    rendering so state never leaks across executions.
    """
    plots: list[dict[str, str]] = []
    try:
        import matplotlib.pyplot as plt  # noqa: PLC0415

        for num in plt.get_fignums():
            if num in cap._preexisting_fignums:
                continue
            fig = plt.figure(num)
            if getattr(fig, "axes", None):
                buf = io.BytesIO()
                fig.savefig(buf, format="png")
                plots.append(
                    {
                        "data": base64.b64encode(buf.getvalue()).decode("utf-8"),
                        "format": "png",
                    }
                )
                buf.close()
            plt.close(fig)
    except ImportError:
        pass
    for fig in cap.plotly_figs:
        try:
            plots.append({"data": fig.to_json(), "format": "json"})
        except Exception:  # noqa: BLE001 — a broken fake/figure skips, like the
            continue  # reference's per-file try (code_executor.py:181-183)
    return plots
