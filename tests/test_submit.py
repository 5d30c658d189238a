"""The north rule's deployment mode: the engine must run via
``spark-submit --py-files`` as a self-contained zip artifact.

Builds omni_crawler_spark.zip, launches tools/submit_smoke.py under
spark-submit from a NEUTRAL working directory (copying the script out
of the repo, so neither the repo root nor tools/ is implicitly on
sys.path) and asserts the drain ran with the package imported from
the zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(dest: str) -> str:
    path = os.path.join(dest, "omni_crawler_spark.zip")
    pkg = os.path.join(REPO, "omni_crawler_spark")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return path


def test_spark_submit_py_files_runs_drain():
    work = tempfile.mkdtemp(prefix="ocs_submit_test_")
    try:
        zip_path = _build_zip(work)
        script = os.path.join(work, "submit_smoke.py")
        shutil.copy(os.path.join(REPO, "tools", "submit_smoke.py"), script)
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("PYTHONPATH",)  # nothing repo-local leaks in
        }
        out = subprocess.run(
            [
                "spark-submit",
                "--master",
                "local[4]",
                "--conf",
                "spark.sql.shuffle.partitions=4",
                "--conf",
                "spark.ui.enabled=false",
                "--conf",
                "spark.driver.host=127.0.0.1",
                "--py-files",
                zip_path,
                script,
                "--urls",
                "3000",
            ],
            cwd=work,
            env=env,
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        last = [
            line
            for line in out.stdout.strip().splitlines()
            if line.startswith("{")
        ][-1]
        res = json.loads(last)
        assert res["ok"] and res["attempted"] > 0 and res["validated"] > 0
        # the package genuinely resolved from the --py-files artifact,
        # not from the repo checkout
        assert ".zip" in res["pkg"], res["pkg"]
    finally:
        shutil.rmtree(work, ignore_errors=True)
