#!/usr/bin/env python
"""Render the markdown documentation into a static HTML site.

The reference ships a Sphinx/readthedocs site (reference
docs/source/conf.py, *.rst); this repo's docs are markdown. Sphinx is not
available in the build image, so this renders the same artifact — a
navigable HTML site with code highlighting-friendly markup and MathJax for
any TeX — with the stdlib-adjacent ``markdown`` package. No network is
required to build; the MathJax script tag only matters when a page is
viewed online (all current pages render fully without it).

Usage: python docs/build_site.py [--out docs/site]
"""

import argparse
import pathlib
import re

import markdown

ROOT = pathlib.Path(__file__).resolve().parent.parent

# page order for the sidebar: (source, title)
PAGES = [
    (ROOT / "README.md", "Overview"),
    (ROOT / "docs" / "choosing.md", "Choosing a sampler"),
    (ROOT / "docs" / "api.md", "API"),
    (ROOT / "docs" / "settings.md", "Settings"),
    (ROOT / "docs" / "box_constraints.md", "Box constraints"),
    (ROOT / "docs" / "diagnostics.md", "Diagnostics"),
    (ROOT / "docs" / "parallel.md", "Scaling & parallelism"),
    (ROOT / "docs" / "performance.md", "Performance"),
    (ROOT / "docs" / "design.md", "Design"),
    (ROOT / "docs" / "migration.md", "Migrating from MCMCLib"),
    (ROOT / "PARITY.md", "Reference parity"),
]

_CSS = """
:root { --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5fa5; --code: #f5f6f7;
        --border: #d8dde2; }
* { box-sizing: border-box; }
body { margin: 0; color: var(--fg); background: var(--bg);
       font: 16px/1.6 system-ui, -apple-system, "Segoe UI", sans-serif; }
.layout { display: flex; min-height: 100vh; }
nav { width: 230px; flex: none; border-right: 1px solid var(--border);
      padding: 1.2rem 1rem; position: sticky; top: 0; height: 100vh;
      overflow-y: auto; }
nav h1 { font-size: 1.05rem; margin: 0 0 .8rem; }
nav a { display: block; color: var(--fg); text-decoration: none;
        padding: .28rem .5rem; border-radius: 6px; font-size: .92rem; }
nav a:hover { background: var(--code); }
nav a.current { background: var(--accent); color: #fff; }
main { flex: 1; max-width: 58rem; padding: 1.6rem 2.2rem 4rem; }
main h1, main h2, main h3 { line-height: 1.25; }
main h1 { font-size: 1.7rem; }
main h2 { margin-top: 2rem; border-bottom: 1px solid var(--border);
          padding-bottom: .25rem; }
a { color: var(--accent); }
pre { background: var(--code); border: 1px solid var(--border);
      border-radius: 8px; padding: .8rem 1rem; overflow-x: auto;
      font-size: .86rem; }
code { background: var(--code); border-radius: 4px; padding: .1rem .3rem;
       font-size: .88em;
       font-family: ui-monospace, "SF Mono", Menlo, Consolas, monospace; }
pre code { background: none; border: 0; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; font-size: .92rem;
        display: block; overflow-x: auto; }
th, td { border: 1px solid var(--border); padding: .4rem .7rem;
         text-align: left; vertical-align: top; }
th { background: var(--code); }
blockquote { border-left: 3px solid var(--accent); margin: 1rem 0;
             padding: .1rem 1rem; color: #444; background: var(--code); }
@media (max-width: 720px) { .layout { display: block; }
  nav { width: auto; height: auto; position: static; } }
"""

_MATHJAX = ('<script id="MathJax-script" async '
            'src="https://cdn.jsdelivr.net/npm/mathjax@3/es5/'
            'tex-mml-chtml.js"></script>')

_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — mcmc_tpu</title>
<style>{css}</style>
{mathjax}
</head>
<body>
<div class="layout">
<nav>
<h1>mcmc_tpu</h1>
{nav}
</nav>
<main>
{body}
</main>
</div>
</body>
</html>
"""


def _slug(path: pathlib.Path) -> str:
    return "index" if path.name == "README.md" else path.stem


def _rewrite_links(html: str) -> str:
    """Point intra-repo markdown links at the rendered pages."""
    known = {p.name: _slug(p) + ".html" for p, _ in PAGES}

    def repl(m):
        target = m.group(2)
        name = target.split("/")[-1].split("#")[0]
        if name in known:
            frag = target.split("#", 1)
            anchor = ("#" + frag[1]) if len(frag) == 2 else ""
            return f'{m.group(1)}{known[name]}{anchor}"'
        return m.group(0)

    return re.sub(r'(href=")([^"]+\.md[^"]*)"', repl, html)


def build(out_dir: pathlib.Path) -> list:
    out_dir.mkdir(parents=True, exist_ok=True)
    md = markdown.Markdown(
        extensions=["tables", "fenced_code", "toc", "sane_lists"])
    written = []
    for path, title in PAGES:
        if not path.exists():
            continue
        md.reset()
        body = _rewrite_links(md.convert(path.read_text()))
        nav = "\n".join(
            f'<a href="{_slug(p)}.html"'
            f'{" class=\"current\"" if p == path else ""}>{t}</a>'
            for p, t in PAGES if p.exists())
        page = _TEMPLATE.format(title=title, css=_CSS, mathjax=_MATHJAX,
                                nav=nav, body=body)
        dest = out_dir / (_slug(path) + ".html")
        dest.write_text(page)
        written.append(dest)
    return written


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "docs" / "site"))
    args = ap.parse_args()
    pages = build(pathlib.Path(args.out))
    print(f"rendered {len(pages)} pages -> {args.out}")
