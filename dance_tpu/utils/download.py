"""Streaming download + archive extraction (parity: dance/utils/download.py)."""

import os
import ssl
import urllib.request
import zipfile

from tqdm import tqdm

from dance_tpu.settings import logger


def download_file(url: str, filename: str) -> bool:
    """Download ``url`` to ``filename`` with a progress bar; returns success."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    try:
        ctx = ssl.create_default_context()
        req = urllib.request.Request(url, headers={"User-Agent": "dance-tpu"})
        with urllib.request.urlopen(req, context=ctx) as resp, open(filename, "wb") as f:
            total = int(resp.headers.get("Content-Length", 0)) or None
            with tqdm(total=total, unit="B", unit_scale=True, desc=os.path.basename(filename)) as bar:
                while chunk := resp.read(1 << 20):
                    f.write(chunk)
                    bar.update(len(chunk))
        return True
    except Exception as e:  # noqa: BLE001 — network failures reported, not raised
        logger.error("Failed to download %s: %s", url, e)
        if os.path.exists(filename):
            os.remove(filename)
        return False


def unzip_file(filename: str, extract_path: str = None) -> bool:
    """Extract a zip archive next to itself (or to ``extract_path``) and remove it."""
    if not os.path.exists(filename):
        logger.error("File not found: %s", filename)
        return False
    extract_path = extract_path or os.path.dirname(os.path.abspath(filename))
    with zipfile.ZipFile(filename) as zf:
        zf.extractall(extract_path)
    os.remove(filename)
    return True


def download_unzip(url: str, path: str) -> bool:
    zip_path = f"{path}.zip"
    return download_file(url, zip_path) and unzip_file(zip_path, path)


def delete_file(path) -> None:
    """Delete a file if it exists (parity: dance/utils/download.py:10)."""
    if os.path.exists(path):
        os.remove(path)
        logger.info("Deleted %s", path)
    else:
        logger.warning("File not found, skipping deletion: %s", path)
