"""Off-box artifact sync (S3/GCS), rebuild of `tridet/utils/s3.py`.

The reference shells out to aws-cli to sync the output dir and download
checkpoints (s3.py:21-50, 97-150) — its de-facto disaster recovery
(SURVEY.md §5.3). Here the same surface supports both `aws s3` and
`gsutil`, chosen by URL scheme, and degrades to a logged no-op when the CLI
is unavailable (air-gapped boxes).
"""
import logging
import os
import shutil
import subprocess
from typing import Optional

LOG = logging.getLogger(__name__)


def _tool_for(url: str) -> Optional[list]:
    if url.startswith("s3://") and shutil.which("aws"):
        return ["aws", "s3"]
    if url.startswith("gs://") and shutil.which("gsutil"):
        return ["gsutil", "-m"]
    return None


def sync_dir(local_dir: str, remote_url: str) -> bool:
    """Sync a local directory to remote storage (tridet/utils/s3.py:128-149)."""
    tool = _tool_for(remote_url)
    if tool is None:
        LOG.warning("No CLI available for %s; skipping sync.", remote_url)
        return False
    cmd = tool + (["sync", local_dir, remote_url] if tool[0] == "aws" else ["rsync", "-r", local_dir, remote_url])
    LOG.info("Syncing %s -> %s", local_dir, remote_url)
    return subprocess.run(cmd, capture_output=True).returncode == 0


def maybe_download_ckpt(path_or_url: str, cache_dir: str = "/tmp/dd3d_tpu_ckpts") -> str:
    """Resolve MODEL.CKPT: remote URLs are downloaded and cached, local paths
    pass through (the reference's CkptPathResolverCallback,
    tridet/utils/hydra/callbacks.py:81-90)."""
    if not (path_or_url.startswith(("s3://", "gs://", "http://", "https://"))):
        return path_or_url
    os.makedirs(cache_dir, exist_ok=True)
    local = os.path.join(cache_dir, os.path.basename(path_or_url))
    if os.path.exists(local):
        return local
    if path_or_url.startswith(("http://", "https://")):
        import urllib.request

        LOG.info("Downloading %s", path_or_url)
        urllib.request.urlretrieve(path_or_url, local)
        return local
    tool = _tool_for(path_or_url)
    if tool is None:
        raise FileNotFoundError(f"Cannot fetch {path_or_url}: no storage CLI available")
    cmd = tool + ["cp", path_or_url, local]
    subprocess.run(cmd, check=True, capture_output=True)
    return local
