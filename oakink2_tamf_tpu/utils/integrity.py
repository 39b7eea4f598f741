"""Asset integrity pins: presence gates -> INTEGRITY gates (round-3 verdict #4).

The fail-loud asset gates (core/mano.get_mano_model, models/clip_text,
models/losses.load_contact_assets) verify that a file EXISTS; a corrupted or
truncated download would still pass and silently poison training. This module
adds SHA256 verification against a pin file.

Pin file format (`asset/SHA256SUMS`, sha256sum-compatible):
    <hex sha256>  <path relative to the pin file's directory>

Workflow:
- `scripts/fetch_assets.sh` records pins for every file it fetches
  (trust-on-first-use: this environment cannot ship upstream hashes for the
  HF-hosted tarballs; the CLIP BPE pin is hard-coded from the published
  value). Committing asset/SHA256SUMS then locks every later machine to the
  first verified download.
- Every gate calls `verify_pinned(path)`: pinned + match -> ok; pinned +
  MISMATCH -> raise (fail-loud: a corrupted asset can no longer train);
  unpinned -> ok with a one-time warning naming the file.
"""

from __future__ import annotations

import hashlib
import logging
import os

_logger = logging.getLogger(__name__)

PIN_BASENAME = "SHA256SUMS"

# verified-once cache: (abspath, size, mtime_ns) -> hex digest
_digest_cache: dict[tuple, str] = {}
_warned_unpinned: set[str] = set()


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    hit = _digest_cache.get(key)
    if hit is not None:
        return hit
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    d = h.hexdigest()
    _digest_cache[key] = d
    return d


def _find_pin_file(path: str) -> str | None:
    """Nearest SHA256SUMS walking up from the file's directory (stops at /)."""
    d = os.path.dirname(os.path.abspath(path))
    while True:
        cand = os.path.join(d, PIN_BASENAME)
        if os.path.isfile(cand):
            return cand
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def load_pins(pin_file: str) -> dict[str, str]:
    pins: dict[str, str] = {}
    with open(pin_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            digest, _, rel = line.partition("  ")
            if len(digest) == 64 and rel:
                pins[rel.strip()] = digest.lower()
    return pins


def verify_pinned(path: str, *, what: str = "asset") -> bool:
    """Verify `path` against the nearest SHA256SUMS pin file.

    Returns True when a pin existed and matched; False when no pin covers the
    file (one warning per process). Raises ValueError on a MISMATCH — a
    pinned asset whose bytes changed must never be trained against."""
    pin_file = _find_pin_file(path)
    if pin_file is None:
        _warn_unpinned(path, what, "no SHA256SUMS found near it")
        return False
    rel = os.path.relpath(os.path.abspath(path), os.path.dirname(pin_file))
    pins = load_pins(pin_file)
    expected = pins.get(rel) or pins.get(rel.replace(os.sep, "/"))
    if expected is None:
        _warn_unpinned(path, what, f"not listed in {pin_file}")
        return False
    actual = sha256_file(path)
    if actual != expected:
        raise ValueError(
            f"{what} {path} FAILS its integrity pin: sha256 {actual} != pinned "
            f"{expected} ({pin_file}). The file is corrupted or was swapped — "
            "re-download it (scripts/fetch_assets.sh) or, if the change is "
            "intentional, re-pin with scripts/fetch_assets.sh --pin."
        )
    return True


def _warn_unpinned(path: str, what: str, why: str) -> None:
    key = os.path.abspath(path)
    if key in _warned_unpinned:
        return
    _warned_unpinned.add(key)
    _logger.warning(
        "%s %s is UNPINNED (%s): integrity not verified. Record pins with "
        "scripts/fetch_assets.sh --pin and commit asset/SHA256SUMS.",
        what, path, why,
    )


def record_pin(path: str, pin_file: str) -> None:
    """Append/update the pin for `path` in `pin_file` (fetch-script helper).

    Refuses to CHANGE a committed pin (delete the stale line first if the
    upstream file legitimately changed); preserves the file's comment
    header."""
    rel = os.path.relpath(os.path.abspath(path), os.path.dirname(os.path.abspath(pin_file)))
    rel = rel.replace(os.sep, "/")
    digest = sha256_file(path)
    pins = load_pins(pin_file) if os.path.isfile(pin_file) else {}
    if rel in pins and pins[rel] != digest:
        raise ValueError(
            f"refusing to overwrite the existing pin for {rel} "
            f"({pins[rel]} -> {digest}): if the upstream asset legitimately "
            f"changed, delete its line from {pin_file} first."
        )
    pins[rel] = digest
    header = ["# sha256 integrity pins - verify with: (cd asset && sha256sum -c SHA256SUMS)\n"]
    if os.path.isfile(pin_file):
        with open(pin_file) as f:
            existing = [ln for ln in f if ln.startswith("#")]
        if existing:
            header = existing
    tmp = pin_file + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        f.writelines(header)
        for r in sorted(pins):
            f.write(f"{pins[r]}  {r}\n")
    os.replace(tmp, pin_file)
