"""Dataset store resolution: path templates + traversal guard (S8), and the
uncertainty-variable convention (S6).

Mirrors reference ``timeseries/app/config.py:63-87``: dataset paths come
from a ``{dataset_id}/{variable_id}``-style template rooted at a base path,
and the resolved path must stay under the base (a request with
``dataset_id="../../etc"`` must die at the API edge, not at the
filesystem). The uncertainty convention maps a variable to its companion
``{variable_id}_uncertainty`` slice.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path


class PathTraversalError(ValueError):
    """Resolved dataset path escapes the configured base path."""


@dataclass(frozen=True)
class DatasetStore:
    base_path: str
    # template resolved relative to base_path; parquet long-table layout
    template: str = "{dataset_id}_{variable_id}"
    uncertainty_suffix: str = "_uncertainty"

    def _resolve(self, dataset_id: str, variable_id: str) -> str:
        base = Path(self.base_path).resolve()
        candidate = (base / self.template.format(
            dataset_id=dataset_id, variable_id=variable_id
        )).resolve()
        try:
            candidate.relative_to(base)
        except ValueError as ex:
            raise PathTraversalError(
                f"resolved path {candidate} escapes base {base}"
            ) from ex
        return str(candidate)

    def dataset_path(self, dataset_id: str, variable_id: str) -> str:
        """S8 — template + guard (reference config.py:63-75)."""
        return self._resolve(dataset_id, variable_id)

    def uncertainty_path(self, dataset_id: str, variable_id: str) -> str:
        """S6 — companion uncertainty slice (reference config.py:82-87)."""
        return self._resolve(dataset_id, variable_id + self.uncertainty_suffix)
