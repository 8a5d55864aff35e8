"""Upload atlas artifacts to cloud storage (parity: examples/atlas/
upload_data.py). Thin CLI over dance_tpu.atlas.data_dropbox_upload — gated:
requires the optional ``dropbox`` package and an access token."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 3)[0])

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("path", help="file or directory to upload")
    p.add_argument("--dest", default="/atlas", help="remote destination folder")
    p.add_argument("--token", default=None, help="Dropbox access token")
    args = p.parse_args()
    import os

    from dance_tpu.atlas.data_dropbox_upload import upload_file
    if os.path.isdir(args.path):
        for root, _, files in os.walk(args.path):
            for f in files:
                local = os.path.join(root, f)
                rel = os.path.relpath(local, args.path)
                upload_file(local, f"{args.dest}/{rel}", access_token=args.token)
    else:
        upload_file(args.path, f"{args.dest}/{os.path.basename(args.path)}",
                    access_token=args.token)
