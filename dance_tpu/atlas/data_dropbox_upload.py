"""Atlas data publishing helpers (parity: dance/atlas/data_dropbox_upload.py:14-117).

Dropbox upload + shared-link minting for new atlas datasets. The dropbox SDK
is optional; import errors surface with an install hint via try_import.
"""

import os

from dance_tpu.settings import logger
from dance_tpu.typing import Optional
from dance_tpu.utils import try_import


def get_client(access_token: Optional[str] = None):
    dropbox = try_import("dropbox")
    token = access_token or os.environ.get("DROPBOX_ACCESS_TOKEN")
    if not token:
        raise ValueError("Provide access_token or set DROPBOX_ACCESS_TOKEN")
    return dropbox.Dropbox(token)


def upload_file(local_path: str, remote_path: str,
                access_token: Optional[str] = None, chunk_size: int = 64 << 20) -> str:
    """Upload a file (chunked for large files) and return the remote path."""
    dropbox = try_import("dropbox")
    dbx = get_client(access_token)
    size = os.path.getsize(local_path)
    with open(local_path, "rb") as f:
        if size <= chunk_size:
            dbx.files_upload(f.read(), remote_path,
                             mode=dropbox.files.WriteMode.overwrite)
        else:
            session = dbx.files_upload_session_start(f.read(chunk_size))
            cursor = dropbox.files.UploadSessionCursor(session_id=session.session_id,
                                                       offset=f.tell())
            commit = dropbox.files.CommitInfo(path=remote_path)
            while f.tell() < size:
                if size - f.tell() <= chunk_size:
                    dbx.files_upload_session_finish(f.read(chunk_size), cursor, commit)
                else:
                    dbx.files_upload_session_append_v2(f.read(chunk_size), cursor)
                    cursor.offset = f.tell()
    logger.info("Uploaded %s -> %s", local_path, remote_path)
    return remote_path


def create_shared_link(remote_path: str, access_token: Optional[str] = None) -> str:
    """Mint (or fetch) a direct-download shared link for a remote file."""
    dropbox = try_import("dropbox")
    dbx = get_client(access_token)
    try:
        link = dbx.sharing_create_shared_link_with_settings(remote_path).url
    except dropbox.exceptions.ApiError:
        links = dbx.sharing_list_shared_links(path=remote_path).links
        if not links:
            raise
        link = links[0].url
    return link.replace("?dl=0", "?dl=1")


def upload_file_to_dropbox(dropbox_path, access_token, local_path):
    """Reference-signature upload (parity: data_dropbox_upload.py:14);
    delegates to :func:`upload_file`."""
    return upload_file(str(local_path), dropbox_path, access_token=access_token)


def get_link(data_fname, local_path, ACCESS_TOKEN, DROPBOX_DEST_PATH):
    """Upload a file and return its direct-download shared link
    (parity: data_dropbox_upload.py:98)."""
    dest = DROPBOX_DEST_PATH + "/" + data_fname
    upload_file_to_dropbox(dropbox_path=dest, access_token=ACCESS_TOKEN,
                           local_path=local_path)
    shared_link = create_shared_link(dest, access_token=ACCESS_TOKEN)
    if shared_link:
        return shared_link.replace("&dl=0", "&dl=1")
    logger.warning("Unable to get shared link.")
    return None


def get_ans(data, tissue: str, dataset_id: str, local_path, ACCESS_TOKEN,
            DROPBOX_DEST_PATH):
    """Metadata row for an uploaded atlas dataset — the scdeepsort.csv column
    layout (parity: data_dropbox_upload.py:117)."""
    import numpy as np

    x = data.X
    vals = x.data if hasattr(x, "data") and not isinstance(x, np.ndarray) else x
    ans = {
        "species": "human",
        "tissue": tissue.capitalize(),
        "dataset": data.n_obs,
        "split": "train",
        "celltype_fname": "",
        "celltype_url": "",
        "data_fname": f"train_human_{tissue.capitalize()}{dataset_id}_data.h5ad",
    }
    ans["data_url"] = get_link(data_fname=ans["data_fname"].split("_", 1)[1],
                               local_path=local_path, ACCESS_TOKEN=ACCESS_TOKEN,
                               DROPBOX_DEST_PATH=DROPBOX_DEST_PATH)
    ans["is_ALL_Integer"] = bool(np.all(np.equal(np.asarray(vals),
                                                 np.asarray(vals).astype(int))))
    return ans


def get_data(path):
    """Load an AnnData for upload from an h5ad path. (The reference's
    upload_data.py example imports this name although its own module never
    defines it; provided here so the import surface resolves.)"""
    from dance_tpu.data.io import read_h5ad
    return read_h5ad(str(path))
