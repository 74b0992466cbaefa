"""Docs build gate: every autodoc target must import and resolve, every
toctree page must exist, and the CLI page must render the live parser
(the checks that make a ``sphinx-build -W`` pass or fail)."""
import os
import sys

import pytest

DOCS = os.path.join(os.path.dirname(__file__), '..', 'docs')
sys.path.insert(0, DOCS)


@pytest.fixture(scope='module')
def built(tmp_path_factory):
    import build_docs
    out = str(tmp_path_factory.mktemp('html'))
    out_dir, n_pages = build_docs.build(out)
    return out_dir, n_pages


def test_all_pages_build(built):
    out_dir, n_pages = built
    # Every reference/*.rst page plus the top-level guide pages builds.
    expected = len([f for f in os.listdir(os.path.join(DOCS, 'reference'))
                    if f.endswith('.rst')])
    expected += len([f for f in os.listdir(DOCS)
                     if f.endswith('.rst') and f != 'index.rst'])
    assert n_pages == expected
    assert os.path.isfile(os.path.join(out_dir, 'index.html'))
    assert os.path.isfile(os.path.join(out_dir, 'porting_guide.html'))


def test_cli_page_renders_live_parser(built):
    out_dir, _ = built
    page = open(os.path.join(out_dir, 'command_line_arguments.html')).read()
    for flag in ('--batch_size', '--lr_schedule_name', '--data_parallel',
                 '--multihost', '--orbax_dir', '--shard_map_step'):
        assert flag in page, f'{flag} missing from CLI docs page'


def test_module_pages_have_content(built):
    out_dir, _ = built
    page = open(os.path.join(out_dir, 'morgana_tpu.ops.html')).read()
    assert 'sequence_mask' in page or 'mlpg' in page.lower()
    page = open(os.path.join(out_dir, 'morgana_tpu.experiment_builder.html')).read()
    assert 'ExperimentBuilder' in page and 'run_experiment' in page


def test_unresolvable_directive_fails(tmp_path):
    import build_docs
    with pytest.raises(build_docs.DocsError, match='failed to import'):
        build_docs._render_automodule('morgana_tpu.does_not_exist')
