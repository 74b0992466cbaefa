"""Dependency-free API docs builder (sphinx-autodoc compatible subset).

Runs ``sphinx-build -W`` when Sphinx is installed. Otherwise it performs the
work that makes an autodoc build pass or fail — and fails loudly on the same
errors:

* walks ``docs/index.rst``'s toctree and every referenced page,
* resolves each ``automodule`` directive by importing the module (import
  errors = build errors, exactly like autodoc),
* enumerates the module's public members (``__all__`` or public names),
  requiring resolvable attributes,
* renders everything (module docstrings, class/function signatures and
  docstrings) to HTML under ``docs/_build/html``,
* renders the command-line-arguments page from the LIVE parser
  (``ExperimentBuilder.add_args``), the sphinx-argparse equivalent.

Exit code is non-zero on any unresolved directive or import failure, so CI
(``tests/test_docs.py``, ``make docs``) can gate on it.
"""
import html
import importlib
import inspect
import io
import os
import re
import sys

DOCS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(DOCS_DIR)
sys.path.insert(0, REPO_DIR)

_PAGE_TMPL = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; max-width: 60em; margin: 2em auto; }}
pre {{ background: #f6f6f6; padding: 0.8em; overflow-x: auto; }}
.member {{ border-top: 1px solid #ddd; margin-top: 1.2em; padding-top: 0.4em; }}
.sig {{ font-family: monospace; font-weight: bold; }}
nav a {{ margin-right: 1em; }}
</style></head><body>
<nav><a href="index.html">index</a></nav>
{body}
</body></html>
"""


class DocsError(Exception):
    pass


def _toctree_entries(index_path):
    entries = []
    in_toctree = False
    for line in open(index_path):
        if line.strip().startswith('.. toctree::'):
            in_toctree = True
            continue
        if in_toctree:
            stripped = line.strip()
            if stripped.startswith(':'):
                continue
            if stripped and not line.startswith(' '):
                in_toctree = False
            elif stripped:
                entries.append(stripped)
    return entries


def _module_members(module):
    names = getattr(module, '__all__', None)
    if names is None:
        names = [n for n in vars(module) if not n.startswith('_')]
    members = []
    for name in names:
        try:
            members.append((name, getattr(module, name)))
        except AttributeError:
            raise DocsError(f'{module.__name__}.__all__ names missing '
                            f'attribute {name!r}')
    return members


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _member_html(name, obj, module_name):
    buf = io.StringIO()
    doc = inspect.getdoc(obj) or ''
    if inspect.isclass(obj):
        buf.write(f'<div class="member"><span class="sig">class {name}'
                  f'{_signature(obj)}</span>\n')
        buf.write(f'<pre>{html.escape(doc)}</pre>\n')
        for mname, meth in inspect.getmembers(obj, inspect.isfunction):
            if mname.startswith('_') or meth.__qualname__.split('.')[0] != name:
                continue
            mdoc = inspect.getdoc(meth) or ''
            buf.write(f'<div class="member"><span class="sig">{name}.{mname}'
                      f'{_signature(meth)}</span>\n'
                      f'<pre>{html.escape(mdoc)}</pre></div>\n')
        buf.write('</div>\n')
    elif callable(obj):
        buf.write(f'<div class="member"><span class="sig">{name}{_signature(obj)}'
                  f'</span>\n<pre>{html.escape(doc)}</pre></div>\n')
    else:
        buf.write(f'<div class="member"><span class="sig">{name}</span> = '
                  f'<code>{html.escape(repr(obj)[:200])}</code></div>\n')
    return buf.getvalue()


def _render_automodule(module_name):
    try:
        module = importlib.import_module(module_name)
    except Exception as exc:
        raise DocsError(f'automodule {module_name!r} failed to import: {exc!r}')
    parts = [f'<h1>{module_name}</h1>',
             f'<pre>{html.escape(inspect.getdoc(module) or "")}</pre>']
    for name, obj in _module_members(module):
        parts.append(_member_html(name, obj, module_name))
    return '\n'.join(parts)


def _render_rst(path):
    """Renders one docs page: automodule directives expand via live
    introspection; everything else passes through as preformatted text."""
    source = open(path).read()
    out = []
    plain = []

    def flush():
        if plain:
            out.append(f'<pre>{html.escape("".join(plain))}</pre>')
            plain.clear()

    lines = source.splitlines(keepends=True)
    i = 0
    while i < len(lines):
        match = re.match(r'\s*\.\.\s+automodule::\s+([\w.]+)', lines[i])
        if match:
            flush()
            out.append(_render_automodule(match.group(1)))
            i += 1
            while i < len(lines) and (lines[i].strip().startswith(':') or
                                      not lines[i].strip()):
                i += 1
            continue
        plain.append(lines[i])
        i += 1
    flush()
    return '\n'.join(out)


def _render_cli_page():
    """The sphinx-argparse equivalent: the flags page comes from the live
    parser, so it can never go stale."""
    import argparse
    from morgana_tpu.experiment_builder import ExperimentBuilder
    parser = argparse.ArgumentParser(prog='python models/<model>.py',
                                     description='morgana_tpu experiment flags')
    # Match get_experiment_args' full surface (it adds --config itself).
    parser.add_argument('--config', dest='config', type=str, default=None,
                        help='JSON file of argument values (e.g. a previous '
                             "run's config.json); explicit command-line "
                             'flags override it.')
    ExperimentBuilder.add_args(parser)
    return ('<h1>Command line arguments</h1>\n'
            '<p>Generated from the live <code>ExperimentBuilder.add_args</code> '
            'parser.</p>\n'
            f'<pre>{html.escape(parser.format_help())}</pre>')


def build(out_dir=None):
    out_dir = out_dir or os.path.join(DOCS_DIR, '_build', 'html')
    os.makedirs(out_dir, exist_ok=True)
    index_path = os.path.join(DOCS_DIR, 'index.rst')
    entries = _toctree_entries(index_path)
    if not entries:
        raise DocsError('no toctree entries found in index.rst')

    links = []
    for entry in entries:
        rst_path = os.path.join(DOCS_DIR, entry + '.rst')
        if not os.path.exists(rst_path):
            raise DocsError(f'toctree entry {entry!r} has no .rst file')
        page = os.path.basename(entry) + '.html'
        if os.path.basename(entry) == 'command_line_arguments':
            body = _render_cli_page()
        else:
            body = _render_rst(rst_path)
        with open(os.path.join(out_dir, page), 'w') as f:
            f.write(_PAGE_TMPL.format(title=entry, body=body))
        links.append(f'<li><a href="{page}">{html.escape(entry)}</a></li>')

    index_body = ('<h1>morgana_tpu API documentation</h1>\n'
                  + _render_rst(index_path)
                  + '\n<ul>\n' + '\n'.join(links) + '\n</ul>')
    with open(os.path.join(out_dir, 'index.html'), 'w') as f:
        f.write(_PAGE_TMPL.format(title='morgana_tpu', body=index_body))
    return out_dir, len(entries)


def main():
    try:
        import sphinx  # noqa: F401
        import subprocess
        rc = subprocess.call([sys.executable, '-m', 'sphinx', '-W', '-b',
                              'html', DOCS_DIR,
                              os.path.join(DOCS_DIR, '_build', 'html')])
        sys.exit(rc)
    except ImportError:
        pass
    try:
        out_dir, n = build()
    except DocsError as exc:
        print(f'docs build FAILED: {exc}', file=sys.stderr)
        sys.exit(1)
    print(f'docs build ok: {n + 1} pages under {out_dir}')


if __name__ == '__main__':
    main()
