"""Fast-tier CLI smoke (VERDICT r3 item 6): entry-point breakage must fail
the default ``pytest tests -q`` run, not only the slow tier.

One 1-epoch ``tools/train.py`` run (which chains the post-train eval, as the
reference does at tools/train.py:180-196) plus one standalone ``tools/test.py``
eval, both on the synthetic KITTI fixture with the committed
``hvpr_mini.yaml`` config — the same module graph as the flagship at toy
shapes. Single virtual CPU device, batch 2, 4 scenes.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CFG = 'cfgs/kitti_models/hvpr_mini.yaml'


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)  # 1 device is enough; keep compile light
    env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    env['JAX_COMPILATION_CACHE_DIR'] = str(REPO / 'tests' / '.jax_cache')
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '1'
    return env


def test_train_and_eval_cli_smoke(tmp_path):
    sys.path.insert(0, str(REPO / 'tests'))
    from kitti_fixture import build_kitti_root
    root, _ = build_kitti_root(tmp_path / 'kitti', n_scenes=4)

    import yaml
    from hvpr_tpu.config import ConfigDict
    from hvpr_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    with open(REPO / 'tools' / CFG) as f:
        data_cfg = ConfigDict(yaml.safe_load(f)['DATA_CONFIG'])
    create_kitti_infos(data_cfg, ['Car'], root, root, workers=2)

    env = _env()
    env['HVPR_ROOT_DIR'] = str(tmp_path)

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'train.py'),
         '--cfg_file', CFG, '--batch_size', '2', '--epochs', '1',
         '--workers', '0', '--extra_tag', 'smoke',
         '--set', 'DATA_CONFIG.DATA_PATH', str(root)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(REPO / 'tools'))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])

    ckpt_dir = tmp_path / 'output' / 'kitti_models' / 'hvpr_mini' / 'smoke' / 'ckpt'
    ckpts = sorted(ckpt_dir.glob('checkpoint_epoch_*.msgpack'))
    assert ckpts, f'no checkpoint written in {ckpt_dir}: {out.stdout[-2000:]}'
    # post-train eval chained and produced results
    eval_dir = ckpt_dir.parent / 'eval' / 'eval_with_train'
    assert list(eval_dir.glob('epoch_*/*/result.pkl')), out.stdout[-2000:]

    out = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test.py'),
         '--cfg_file', CFG, '--batch_size', '2', '--workers', '0',
         '--extra_tag', 'smoke', '--ckpt', str(ckpts[-1]),
         '--set', 'DATA_CONFIG.DATA_PATH', str(root)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(REPO / 'tools'))
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    assert 'Evaluation done' in out.stdout + out.stderr
