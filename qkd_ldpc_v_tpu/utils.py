"""Small host-side utilities (reference: src/utils.cpp)."""

from __future__ import annotations

from pathlib import Path
from typing import List


def get_file_paths_in_directory(directory, extension: str) -> List[Path]:
    """Sorted file paths with the given extension
    (reference: src/utils.cpp:20-34; throws when the directory is missing,
    returns lexicographically ordered paths like fs::directory_iterator on
    the reference's sorted-by-name volumes)."""
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"Directory does not exist: {directory}")
    return sorted(p for p in directory.iterdir() if p.suffix == extension)


def format_duration(seconds: float) -> str:
    """``00h-00m-00s`` duration string (reference: src/main.cpp:180-183)."""
    total = int(seconds)
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    return f"{h:02d}h-{m:02d}m-{s:02d}s"
