"""Generate WARC fixtures + independent expected rows for graft.sources.Warc
and the composed WARC -> HTML main-content extraction chain.

Two files exercise both physical layouts the reader supports:
  sample_00.warc     plain: warcinfo, request, a utf-8 HTML response, a JSON
                     response (records-visible, extraction-skipped)
  sample_01.warc.gz  one gzip MEMBER per record (the Common Crawl layout):
                     a latin-1 HTML response whose main content lives in a
                     hinted <div class="post-content"> (not <article>), a 404
                     HTML response (extraction-skipped), a latin-1 response
                     whose charset is declared ONLY by a legacy http-equiv
                     <meta> in the body (bare text/html HTTP header — the
                     reader must prescan), a metadata record

Expected rows are computed HERE from the construction, not by running the
Scala code: record rows from the bytes this script assembles (sha256 of the
HTTP body / raw payload), extraction rows from the page structure this
script plants (heading + sentence paragraphs + planted figure — the same
deterministic-wrap trick the q_html_spans oracle uses). Any drift in the
record framing, gzip-member handling, charset decode, DOM parse, or
container heuristics fails WarcSpec / the q_warc_* oracles.

Outputs: src/test/resources/media/warc/sample_00.warc
         src/test/resources/media/warc/sample_01.warc.gz
         src/test/resources/expected/warc_records.parquet
         src/test/resources/expected/warc_extract.parquet
"""
import gzip
import hashlib
import html as htmlmod
import io
import os
from urllib.parse import urljoin, urlsplit

import pyarrow as pa
import pyarrow.parquet as pq

OUTDIR = 'src/test/resources/media/warc'
EXP_RECORDS = 'src/test/resources/expected/warc_records.parquet'
EXP_EXTRACT = 'src/test/resources/expected/warc_extract.parquet'
EXP_LINKS = 'src/test/resources/expected/warc_links.parquet'
EXP_FRONTIER = 'src/test/resources/expected/warc_frontier.parquet'
EXP_ROBOTS = 'src/test/resources/expected/warc_robots.parquet'
EXP_EDGES = 'src/test/resources/expected/warc_edges.parquet'
EXP_REDIRECTS = 'src/test/resources/expected/warc_redirects.parquet'
EXP_CHAINS = 'src/test/resources/expected/warc_redirect_chains.parquet'
EXP_SITEMAP = 'src/test/resources/expected/warc_sitemap.parquet'
EXP_RANK = 'src/test/resources/expected/warc_rank.parquet'
EXP_ANCHOR = 'src/test/resources/expected/warc_anchor_links.parquet'
EXP_CDX = 'src/test/resources/expected/warc_cdx.parquet'

IMG_EVERY = 4  # must match Queries.HtmlImgEvery


def page_for(doc_id, text):
    """Python mirror of Queries.htmlPageFor (the deterministic article wrap)."""
    pieces = text.split('. ')
    out = io.StringIO()
    out.write(f'<!DOCTYPE html>\n<html lang="en"><head><title>Doc {doc_id}</title>'
              f'<meta name="description" content="About doc {doc_id}">'
              f'<link rel="canonical" href="https://docs.example/{doc_id}">'
              '<style>article{margin:0 auto}</style>'
              '<script>var graftPage = 1 < 2;</script></head>\n<body>\n'
              '<header><nav><ul><li><a href="/">Home</a></li>'
              '<li><a href="/archive">Archive</a></li>'
              '<li><a href="/about">About us</a></li></ul></nav></header>\n'
              '<aside class="sidebar"><h3>Related posts</h3><ul>'
              '<li><a href="/p/1">a related piece about table scan merge order in long form</a></li>'
              '<li><a href="/p/2" rel="nofollow">another related article on hash join windows and streams</a></li>'
              '<li><a href="/p/3">further reading on batch vectors and partition pruning</a></li>'
              f'</ul></aside>\n<article><h1>Doc {doc_id} title</h1>')
    for i, p in enumerate(pieces):
        out.write('<p>' + htmlmod.escape(p, quote=True) + '</p>')
        if i == 0 and doc_id % IMG_EVERY == 0:
            out.write(f'<img src="media://doc_{doc_id}/img_0" alt="figure for doc {doc_id}">')
    out.write('</article>\n<div class="comments"><h3>Comments</h3>'
              '<p>first comment nice post thanks for sharing this with us</p>'
              '<p>second comment totally agree with the points the author makes here</p></div>\n'
              '<footer><p>copyright 2026 example corp all rights reserved '
              '<a href="/privacy">privacy</a> <a href="/terms">terms</a></p></footer>\n'
              '</body></html>')
    return out.getvalue()


def page_spans(doc_id, text):
    """Expected spans for page_for (same rule as the q_html_spans oracle)."""
    pieces = text.split('. ')
    spans = [('heading', f'Doc {doc_id} title', '', 0)]
    off = 1
    for i, p in enumerate(pieces):
        spans.append(('text', p, '', off))
        off += 1
        if i == 0 and doc_id % IMG_EVERY == 0:
            spans.append(('image', f'figure for doc {doc_id}',
                          f'media://doc_{doc_id}/img_0', off))
            off += 1
    spans.sort(key=lambda s: s[3])
    return spans


# page B: main content in a HINTED div, not <article>; latin-1 charset
B_PARAS = ['caf\xe9 d\xe9tail with accents \xe0 la carte',
           'second paragraph of the latin section']
PAGE_B = ('<html><head><title>Latin page</title></head><body>'
          '<div class="sidebar"><ul>'
          '<li><a href="/x">sidebar link one with plenty of words</a></li>'
          '<li><a href="/y">sidebar link two with plenty more words</a></li></ul></div>'
          '<div class="post-content"><h2>Latin Section</h2>'
          + ''.join(f'<p>{p}</p>' for p in B_PARAS) +
          '</div>'
          '<div class="comments"><p>a comment thread that is quite long and full of '
          'repeated opinions replies and yet more replies</p></div>'
          '<footer><p>footer text <a href="/t">terms</a></p></footer>'
          '</body></html>')
B_SPANS = [('heading', 'Latin Section', '', 0)] + \
          [('text', p, '', i + 1) for i, p in enumerate(B_PARAS)]

# page E: charset declared ONLY via the legacy http-equiv <meta> (the HTTP
# header is bare text/html) — a reader without the HTML5 prescan decodes
# the latin-1 accent bytes as broken utf-8 and hash-mismatches
E_PARAS = ['pr\xe9cis of the meta declared page \xfcber all',
           'plain second paragraph keeps the block count honest']
PAGE_E = ('<html><head>'
          '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
          '<title>Meta page</title></head><body>'
          '<nav><a href="/h">home link text</a></nav>'
          '<main>'
          '<h2>Meta Declared</h2>'
          + ''.join(f'<p>{p}</p>' for p in E_PARAS) +
          '</main>'
          '<footer><p>footer words <a href="/c">contact</a></p></footer>'
          '</body></html>')
E_SPANS = [('heading', 'Meta Declared', '', 0)] + \
          [('text', p, '', i + 1) for i, p in enumerate(E_PARAS)]

# page F: the LINK PLAYGROUND — every href class the frontier build must
# resolve/normalize (RFC 3986 relative forms, protocol-relative, fragment-
# only, query-only, case + default-port canonicalization, explicit port,
# non-http schemes, a cross-page duplicate, a nofollow). Links live in
# <nav> (chrome — invisible to main-content extraction, visible to
# PageMeta), main content is a minimal heading+paragraph
F_PARA = 'frontier paragraph with enough plain words to stand alone'
F_LINKS = [
    ('item', 'plain relative item link', ''),
    ('./sibling', 'dot slash sibling link', ''),
    ('../up', 'parent directory link', ''),
    ('/rooted', 'root absolute link', ''),
    ('//cdn.example/lib', 'protocol relative link', ''),
    ('#frag', 'fragment only link', ''),
    ('?q=2', 'query only link', ''),
    ('HTTPS://Other.EXAMPLE:443/Case', 'case and port link', ''),
    ('http://example.org:8080/alt', 'explicit port link', ''),
    ('mailto:team@example.org', 'mail link', ''),
    ('javascript:void(0)', 'script link', ''),
    ('/p/1', 'cross page duplicate link', ''),
    ('/hidden', 'nofollowed link', 'nofollow noopener'),
    # rel is an ASCII-case-insensitive whitespace-separated token set:
    # a shouty tab-separated NOFOLLOW must be honored too
    ('/hidden2', 'shouty nofollow link', 'External\tNOFOLLOW')]
PAGE_F = ('<html><head><title>Links playground</title></head><body>'
          '<nav><ul>'
          + ''.join(
              '<li><a href="%s"%s>%s</a></li>'
              % (h, f' rel="{r}"' if r else '', a) for h, a, r in F_LINKS) +
          '</ul></nav>'
          '<main><h2>Frontier Cases</h2>'
          f'<p>{F_PARA}</p></main>'
          '</body></html>')
F_SPANS = [('heading', 'Frontier Cases', '', 0), ('text', F_PARA, '', 1)]

# page G: a SECOND-HOST page (other.example) so the host link graph has a
# cycle (example.org <-> other.example via F's Case link and G's hub link),
# a two-in-degree node (cdn.example referenced from both hosts) and a
# dangling sink (static.example, never crawled) — the structure the
# PageRank query needs to show real iteration dynamics instead of a
# one-hop star
G_PARA = 'second host paragraph with plenty of plain standalone words'
G_LINKS = [
    ('https://example.org/', 'back to the hub', ''),
    ('//cdn.example/app.js', 'shared script bundle', ''),
    ('https://static.example/logo.png', 'logo asset link', ''),
    ('/local', 'local page on this host', '')]
PAGE_G = ('<html><head><title>Second host</title></head><body>'
          '<nav><ul>'
          + ''.join(
              '<li><a href="%s"%s>%s</a></li>'
              % (h, f' rel="{r}"' if r else '', a) for h, a, r in G_LINKS) +
          '</ul></nav>'
          '<main><h2>Other Host</h2>'
          f'<p>{G_PARA}</p></main>'
          '</body></html>')
G_SPANS = [('heading', 'Other Host', '', 0), ('text', G_PARA, '', 1)]


def surt_of(url):
    """Independent SURT twin (urlsplit-based, vs Scala's RFC 3986 parser):
    scheme dropped, host lowercased + label-reversed with commas, explicit
    non-default port kept, ')' + path?query."""
    u = urlsplit(url)
    if u.scheme not in ('http', 'https'):
        return None
    host = (u.hostname or '').lower()
    port = u.port
    default = 80 if u.scheme == 'http' else 443
    p = '' if (port is None or port == default) else ':%d' % port
    path = u.path or '/'
    q = ('?' + u.query) if u.query else ''
    return ','.join(reversed(host.split('.'))) + p + ')' + path + q


def normalize_http(url):
    """Python twin of UrlResolve.normalizeHttp (independent impl via urlsplit):
    lowercase scheme+host, drop default port, empty path -> '/', strip
    fragment; None for non-http(s)."""
    u = urlsplit(url)  # urlsplit lowercases the scheme
    if u.scheme not in ('http', 'https'):
        return None
    netloc = u.netloc
    userinfo, hostport = ('', netloc) if '@' not in netloc else \
        (netloc[:netloc.rindex('@') + 1], netloc[netloc.rindex('@') + 1:])
    if ':' in hostport and hostport.rindex(':') > hostport.rfind(']'):
        host, port = hostport[:hostport.rindex(':')], hostport[hostport.rindex(':') + 1:]
    else:
        host, port = hostport, ''
    default = '80' if u.scheme == 'http' else '443'
    keep = f':{port}' if port and port != default else ''
    return (f'{u.scheme}://{userinfo}{host.lower()}{keep}'
            f'{u.path or "/"}' + (f'?{u.query}' if u.query else ''))


def host_of(url):
    hostport = urlsplit(url).netloc.rsplit('@', 1)[-1]
    if ':' in hostport and hostport.rindex(':') > hostport.rfind(']'):
        hostport = hostport[:hostport.rindex(':')]
    return hostport.lower()


# ---- robots (RFC 9309) Python twin ----------------------------------------
# the politeness rules planted for example.org: longest-match precedence
# (/p/1 carve-out beats /p/), a query-string wildcard, a $-anchored rule,
# and a closed * group the graftbot agent must NOT fall into
ROBOTS_BODY = (
    '# graft politeness rules\n'
    'Sitemap: https://example.org/sitemap_index.xml\n'
    'User-agent: graftbot\n'
    'Disallow: /p/\n'
    'Allow: /p/1\n'
    'Disallow: /*?q=\n'
    'Disallow: /terms$\n'
    '\n'
    'User-agent: *\n'
    'Disallow: /\n')
ROBOTS_AGENT = 'graftbot'

# the sitemap family: robots.txt announces an INDEX, the index names two
# urlsets (one consumer indirection level, the protocol's maximum), and
# urlset B plants a cross-origin entry (evil.example) plus an http-scheme
# entry on the https origin — both must be DROPPED by the protocol's
# same-origin guard; sitemap A's uppercase loc exercises canonicalization
SM_NS = 'http://www.sitemaps.org/schemas/sitemap/0.9'
SITEMAP_INDEX = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    f'<sitemapindex xmlns="{SM_NS}">'
    '<sitemap><loc>https://example.org/sitemap_a.xml</loc></sitemap>'
    '<sitemap><loc>https://example.org/sitemap_b.xml</loc>'
    '<lastmod>2026-08-01</lastmod></sitemap>'
    '</sitemapindex>')
SITEMAP_A = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    f'<urlset xmlns="{SM_NS}">'
    '<url><loc>https://example.org/p/9</loc><lastmod>2026-07-01</lastmod></url>'
    '<url><loc>https://example.org/archive</loc></url>'
    '<url><loc>HTTPS://EXAMPLE.ORG/news?id=4</loc>'
    '<lastmod>2026-08-15T10:00:00Z</lastmod></url>'
    '</urlset>')
SITEMAP_B = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    f'<urlset xmlns="{SM_NS}">'
    '<url><loc>https://example.org/p/1</loc><lastmod>2026-06-20</lastmod></url>'
    '<url><loc>https://evil.example/injected</loc></url>'
    '<url><loc>http://example.org/insecure</loc></url>'
    '</urlset>')
SITEMAP_DOCS = {
    'https://example.org/sitemap_index.xml': SITEMAP_INDEX,
    'https://example.org/sitemap_a.xml': SITEMAP_A,
    'https://example.org/sitemap_b.xml': SITEMAP_B,
}


def sitemap_rows():
    """ElementTree twin of text.Sitemaps + the query's origin guard."""
    import xml.etree.ElementTree as ET

    def ln(tag):
        return tag.rsplit('}', 1)[-1]

    rows = set()

    def handle_urlset(u, root):
        org = origin_of(u)
        for url_el in root:
            if ln(url_el.tag) != 'url':
                continue
            loc = lastmod = None
            for c in url_el:
                if ln(c.tag) == 'loc':
                    loc = (c.text or '').strip()
                elif ln(c.tag) == 'lastmod':
                    lastmod = (c.text or '').strip()
            if not loc:
                continue
            norm = normalize_http(loc)
            if norm is None or origin_of(norm) != org:
                continue
            rows.add((norm, host_of(norm), lastmod or '', u))

    announced = [u for u in robots_sitemaps(ROBOTS_BODY)]
    for u in announced:
        nu = normalize_http(u)
        if nu not in SITEMAP_DOCS:
            continue
        root = ET.fromstring(SITEMAP_DOCS[nu])
        if ln(root.tag) == 'sitemapindex':
            for sm in root:
                if ln(sm.tag) != 'sitemap':
                    continue
                loc = next(((c.text or '').strip() for c in sm
                            if ln(c.tag) == 'loc'), None)
                cu = normalize_http(loc) if loc else None
                if cu in SITEMAP_DOCS:
                    handle_urlset(cu, ET.fromstring(SITEMAP_DOCS[cu]))
        else:
            handle_urlset(nu, root)
    return sorted(rows, key=lambda r: (r[3], r[0]))


def robots_sitemaps(body):
    out = []
    for raw in body.splitlines():
        line = raw.split('#', 1)[0].strip()
        if ':' not in line:
            continue
        key, value = line.split(':', 1)
        if key.strip().lower() == 'sitemap' and value.strip():
            out.append(value.strip())
    return out


# (record_id, redirecting uri, status, reason, Location header value)
REDIRECT_RECS = [
    ('rd1', 'https://example.org/old', 301, 'Moved Permanently', '/a'),
    ('rd2', 'https://example.org/older', 308, 'Permanent Redirect', '/old'),
    ('rd3', 'https://example.org/tmp', 302, 'Found',
     'https://other.example/hub'),
    ('rd4', 'https://example.org/loop1', 302, 'Found', '/loop2'),
    ('rd5', 'https://example.org/loop2', 302, 'Found', '/loop1'),
]
REDIRECT_MAX_HOPS = 8


def robots_groups(body):
    groups, agents, rules, in_rules = [], [], [], False
    for raw in body.splitlines():
        line = raw.split('#', 1)[0].strip()
        if ':' not in line:
            continue
        key, value = line.split(':', 1)
        key, value = key.strip().lower(), value.strip()
        if key == 'user-agent':
            if in_rules:
                groups.append((agents, rules))
                agents, rules, in_rules = [], [], False
            agents.append(value.lower())
        elif key in ('allow', 'disallow') and agents:
            in_rules = True
            rules.append((key == 'allow', value))
    if agents:
        groups.append((agents, rules))
    return groups


def robots_matches(pattern, target):
    if not pattern:
        return False
    anchored = len(pattern) > 1 and pattern.endswith('$')
    p = pattern[:-1] if anchored else pattern
    import re
    rx = '.*'.join(re.escape(s) for s in p.split('*'))
    rx = '^' + rx + ('$' if anchored else '')
    return re.search(rx, target) is not None


def robots_allowed(body, agent, url):
    groups = robots_groups(body)
    exact = [g for g in groups if agent.lower() in g[0]]
    chosen = exact if exact else [g for g in groups if '*' in g[0]]
    rules = [r for g in chosen for r in g[1]]
    u = urlsplit(url)
    target = (u.path or '/') + (f'?{u.query}' if u.query else '')
    best_len, best_allow = -1, True
    for allow, pattern in rules:
        if robots_matches(pattern, target):
            ln = len(pattern)
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    return best_allow


def origin_of(url):
    u = urlsplit(url)
    rest = normalize_http(url)
    return rest[:rest.index('/', len(u.scheme) + 3)]


def http_response(status, reason, ctype, body_bytes, location=None):
    head = (f'HTTP/1.1 {status} {reason}\r\n'
            + (f'Location: {location}\r\n' if location else '')
            + f'Content-Type: {ctype}\r\n'
            f'Content-Length: {len(body_bytes)}\r\n\r\n').encode('ascii')
    return head + body_bytes


def warc_record(wtype, rec_id, uri, payload, ctype):
    h = f'WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Record-ID: <urn:uuid:{rec_id}>\r\n'
    h += 'WARC-Date: 2026-08-17T00:00:00Z\r\n'
    if uri:
        h += f'WARC-Target-URI: {uri}\r\n'
    h += f'Content-Type: {ctype}\r\nContent-Length: {len(payload)}\r\n\r\n'
    return h.encode('ascii') + payload + b'\r\n\r\n'


def main():
    os.makedirs(OUTDIR, exist_ok=True)
    os.makedirs(os.path.dirname(EXP_RECORDS), exist_ok=True)

    rec_rows = []   # (name, rec_idx, warc_type, uri, status, content_type, body_len, body_sha)
    ext_rows = []   # (name, uri, offset, kind, text, media_ref)
    link_rows = []  # (name, uri, link_idx, href, anchor, rel)

    # anchors of each 200 text/html page IN DOCUMENT ORDER, enumerated from
    # the construction (the independent expectation for q_warc_links)
    PAGE_A_LINKS = [
        ('/', 'Home', ''), ('/archive', 'Archive', ''), ('/about', 'About us', ''),
        ('/p/1', 'a related piece about table scan merge order in long form', ''),
        ('/p/2', 'another related article on hash join windows and streams', 'nofollow'),
        ('/p/3', 'further reading on batch vectors and partition pruning', ''),
        ('/privacy', 'privacy', ''), ('/terms', 'terms', '')]
    PAGE_B_LINKS = [
        ('/x', 'sidebar link one with plenty of words', ''),
        ('/y', 'sidebar link two with plenty more words', ''),
        ('/t', 'terms', '')]
    PAGE_E_LINKS = [('/h', 'home link text', ''), ('/c', 'contact', '')]

    def add_links(name, uri, links):
        for i, (href, anchor, rel) in enumerate(links):
            link_rows.append((name, uri, i, href, anchor, rel))

    def add_rec(name, idx, wtype, uri, status, ctype, body):
        rec_rows.append((name, idx, wtype, uri, status, ctype, len(body),
                         hashlib.sha256(body).hexdigest()))

    # ---- sample_00.warc (plain) --------------------------------------------
    name0 = 'sample_00.warc'
    a_text = 'caf\xe9 first sentence with 中文 words. second sentence & more. third'
    a_doc = 9000  # % 4 == 0 -> planted figure
    a_html = page_for(a_doc, a_text).encode('utf-8')
    a_uri = 'https://example.org/a'
    c_body = b'{"not": "html"}'
    c_uri = 'https://example.org/api'
    r_body = ROBOTS_BODY.encode('utf-8')
    r_uri = 'https://example.org/robots.txt'
    m_uri = 'https://mirror.example/a'
    info_payload = b'software: graft-gen 1.0\r\nformat: WARC File Format 1.0\r\n'
    req_payload = (b'GET /a HTTP/1.1\r\nHost: example.org\r\n'
                   b'User-Agent: graft-gen\r\n\r\n')

    recs0 = [
        ('warcinfo', 'w0', '', info_payload, 'application/warc-fields'),
        ('request', 'q0', a_uri, req_payload, 'application/http;msgtype=request'),
        ('response', 'r0', a_uri,
         http_response(200, 'OK', 'text/html; charset=utf-8', a_html),
         'application/http;msgtype=response'),
        ('response', 'r1', c_uri,
         http_response(200, 'OK', 'application/json', c_body),
         'application/http;msgtype=response'),
        ('response', 'rb', r_uri,
         http_response(200, 'OK', 'text/plain', r_body),
         'application/http;msgtype=response'),
    ] + [
        # the redirect family: a permanent hop to a live page (relative
        # Location), a two-hop 308->301 chain, a temporary cross-host hop,
        # and a 302 loop pair the chain resolver must refuse to follow
        # forever
        ('response', rid, uri,
         http_response(status, reason, 'text/html', b'', location=loc),
         'application/http;msgtype=response')
        for rid, uri, status, reason, loc in REDIRECT_RECS
    ] + [
        ('response', f'sm{i}', uri,
         http_response(200, 'OK', 'application/xml', body.encode('utf-8')),
         'application/http;msgtype=response')
        for i, (uri, body) in enumerate(sorted(SITEMAP_DOCS.items()))
    ] + [
        # a byte-identical MIRROR of page A on a different host — the
        # duplicate-content case q_warc_mirrors must group by payload digest
        ('response', 'mr', m_uri,
         http_response(200, 'OK', 'text/html; charset=utf-8', a_html),
         'application/http;msgtype=response'),
    ]
    with open(os.path.join(OUTDIR, name0), 'wb') as f:
        for wtype, rid, uri, payload, ctype in recs0:
            f.write(warc_record(wtype, rid, uri, payload, ctype))
    add_rec(name0, 0, 'warcinfo', '', 0, '', info_payload)
    add_rec(name0, 1, 'request', a_uri, 0, '', req_payload)
    add_rec(name0, 2, 'response', a_uri, 200, 'text/html; charset=utf-8', a_html)
    add_rec(name0, 3, 'response', c_uri, 200, 'application/json', c_body)
    add_rec(name0, 4, 'response', r_uri, 200, 'text/plain', r_body)
    for i, (_rid, uri, status, _reason, _loc) in enumerate(REDIRECT_RECS):
        add_rec(name0, 5 + i, 'response', uri, status, 'text/html', b'')
    for i, (uri, body) in enumerate(sorted(SITEMAP_DOCS.items())):
        add_rec(name0, 5 + len(REDIRECT_RECS) + i, 'response', uri, 200,
                'application/xml', body.encode('utf-8'))
    add_rec(name0, 5 + len(REDIRECT_RECS) + len(SITEMAP_DOCS), 'response',
            m_uri, 200, 'text/html; charset=utf-8', a_html)
    for kind, text, media_ref, off in page_spans(a_doc, a_text):
        ext_rows.append((name0, a_uri, off, kind, text, media_ref))
        ext_rows.append((name0, m_uri, off, kind, text, media_ref))
    add_links(name0, a_uri, PAGE_A_LINKS)
    add_links(name0, m_uri, PAGE_A_LINKS)

    # ---- sample_01.warc.gz (one gzip member per record) --------------------
    name1 = 'sample_01.warc.gz'
    b_html = PAGE_B.encode('iso-8859-1')
    b_uri = 'https://example.org/latin'
    d_html = b'<html><body><main><p>not found page body text here</p></main></body></html>'
    d_uri = 'https://example.org/missing'
    e_html = PAGE_E.encode('iso-8859-1')
    e_uri = 'https://example.org/meta'
    f_html = PAGE_F.encode('utf-8')
    f_uri = 'https://example.org/dir/page'
    g_html = PAGE_G.encode('utf-8')
    g_uri = 'https://other.example/hub'
    meta_payload = b'fetchTimeMs: 12\r\n'

    recs1 = [
        ('response', 'r2', b_uri,
         http_response(200, 'OK', 'text/html; charset=iso-8859-1', b_html),
         'application/http;msgtype=response'),
        ('response', 'r3', d_uri,
         http_response(404, 'Not Found', 'text/html; charset=utf-8', d_html),
         'application/http;msgtype=response'),
        ('response', 'r4', e_uri,
         http_response(200, 'OK', 'text/html', e_html),
         'application/http;msgtype=response'),
        ('response', 'r5', f_uri,
         http_response(200, 'OK', 'text/html; charset=utf-8', f_html),
         'application/http;msgtype=response'),
        ('metadata', 'm0', b_uri, meta_payload, 'application/warc-fields'),
        ('response', 'r6', g_uri,
         http_response(200, 'OK', 'text/html; charset=utf-8', g_html),
         'application/http;msgtype=response'),
    ]
    # the CDX expectation: member byte ranges recorded AS WRITTEN (the
    # ground truth the Scala RFC 1952 member scanner must recover), SURT
    # and digest computed by independent Python twins
    cdx_meta = {
        'r2': (200, 'text/html', b_html), 'r3': (404, 'text/html', d_html),
        'r4': (200, 'text/html', e_html), 'r5': (200, 'text/html', f_html),
        'r6': (200, 'text/html', g_html)}
    cdx_rows = []
    with open(os.path.join(OUTDIR, name1), 'wb') as f:
        off = 0
        for wtype, rid, uri, payload, ctype in recs1:
            rec = warc_record(wtype, rid, uri, payload, ctype)
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode='wb', mtime=0) as g:
                g.write(rec)
            mem = buf.getvalue()
            f.write(mem)
            if wtype == 'response':
                status, mime, body = cdx_meta[rid]
                cdx_rows.append((
                    surt_of(uri), '20260817000000', uri, mime, status,
                    hashlib.sha256(body).hexdigest(), off, len(mem), name1))
            off += len(mem)
    cdx_rows.sort(key=lambda r: (r[0], r[1], r[6]))
    add_rec(name1, 0, 'response', b_uri, 200, 'text/html; charset=iso-8859-1', b_html)
    add_rec(name1, 1, 'response', d_uri, 404, 'text/html; charset=utf-8', d_html)
    add_rec(name1, 2, 'response', e_uri, 200, 'text/html', e_html)
    add_rec(name1, 3, 'response', f_uri, 200, 'text/html; charset=utf-8', f_html)
    add_rec(name1, 4, 'metadata', b_uri, 0, '', meta_payload)
    add_rec(name1, 5, 'response', g_uri, 200, 'text/html; charset=utf-8', g_html)
    for kind, text, media_ref, off in B_SPANS:
        ext_rows.append((name1, b_uri, off, kind, text, media_ref))
    for kind, text, media_ref, off in E_SPANS:
        ext_rows.append((name1, e_uri, off, kind, text, media_ref))
    for kind, text, media_ref, off in F_SPANS:
        ext_rows.append((name1, f_uri, off, kind, text, media_ref))
    for kind, text, media_ref, off in G_SPANS:
        ext_rows.append((name1, g_uri, off, kind, text, media_ref))
    add_links(name1, b_uri, PAGE_B_LINKS)
    add_links(name1, e_uri, PAGE_E_LINKS)
    add_links(name1, f_uri, [(h, a, r) for h, a, r in F_LINKS])
    add_links(name1, g_uri, G_LINKS)

    # ---- frontier expectation: urljoin (stdlib) + the normalize twin -------
    # nofollow excluded (space-separated rel token list), non-http dropped,
    # dedup on the canonical form with a per-url reference count
    frontier = {}
    pages = [(a_uri, PAGE_A_LINKS), (m_uri, PAGE_A_LINKS),
             (b_uri, PAGE_B_LINKS), (e_uri, PAGE_E_LINKS),
             (f_uri, F_LINKS), (g_uri, G_LINKS)]
    for uri, links in pages:
        for href, _anchor, rel in links:
            if 'nofollow' in rel.lower().split():
                continue
            norm = normalize_http(urljoin(uri, href))
            if norm is not None:
                frontier[norm] = frontier.get(norm, 0) + 1
    frontier_rows = sorted(
        (url, host_of(url), n) for url, n in frontier.items())

    # ---- anchor-link expectation: the SAME followable-link resolution the
    # frontier uses, anchor text kept — one row per (resolved target, source
    # page, source host, anchor). q_warc_anchors' oracle recomputes the full
    # per-target aggregation (counts, distinct pages/hosts, top anchor with
    # lexicographic-min tiebreak) from these rows in DuckDB, so the oracle
    # verifies the aggregation arithmetic, not a dumped result
    anchor_rows = sorted(
        (normalize_http(urljoin(uri, href)), uri, host_of(uri), anchor)
        for uri, links in pages
        for href, anchor, rel in links
        if 'nofollow' not in rel.lower().split()
        and normalize_http(urljoin(uri, href)) is not None)

    # ---- politeness expectation: the frontier through the robots twin ------
    # robots scope is the ORIGIN (scheme://host[:port]); only example.org's
    # https origin has a planted robots.txt, every other origin defaults to
    # allowed
    robots_by_origin = {origin_of(r_uri): ROBOTS_BODY}
    robots_rows = [
        (url, host, n,
         robots_allowed(robots_by_origin[origin_of(url)], ROBOTS_AGENT, url)
         if origin_of(url) in robots_by_origin else True)
        for url, host, n in frontier_rows]

    # ---- redirect map + chain-resolution twin -------------------------------
    # from/to both canonicalized; Location may be relative (RFC 7231), so it
    # resolves against the redirecting URI like any frontier href. The chain
    # twin follows the map to a terminal with the same hop cap as the Scala
    # query and the DuckDB recursive CTE; a chain still pointing at a
    # redirect source at the cap (the planted 302 loop) is unresolved.
    redirect_rows = sorted(
        (normalize_http(uri), normalize_http(urljoin(uri, loc)), status)
        for _rid, uri, status, _reason, loc in REDIRECT_RECS)
    rmap = {f: t for f, t, _s in redirect_rows}
    chain_rows = []
    for f in sorted(rmap):
        cur, hops = rmap[f], 1
        while cur in rmap and hops < REDIRECT_MAX_HOPS:
            cur, hops = rmap[cur], hops + 1
        if cur in rmap:
            chain_rows.append((f, '', 0, True))
        else:
            chain_rows.append((f, cur, hops, False))

    # ---- host link graph + integer PageRank twin ----------------------------
    # distinct (src_host -> dst_host) edges from the same followable-link set
    # the frontier uses, self-edges dropped; rank = 10 power iterations in
    # integer micro-units (rank//outdeg contributions, 0.15*base + (85*sum)//100,
    # dangling mass leaves the system) — exactly the arithmetic of the Scala
    # query AND the DuckDB oracle, so all three engines agree bit-for-bit
    edges = set()
    for uri, links in pages:
        for href, _anchor, rel in links:
            if 'nofollow' in rel.lower().split():
                continue
            norm = normalize_http(urljoin(uri, href))
            if norm is not None and host_of(uri) != host_of(norm):
                edges.add((host_of(uri), host_of(norm)))
    edge_rows = sorted(edges)
    nodes = sorted({h for e in edge_rows for h in e})
    outdeg = {}
    for s, _d in edge_rows:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank_base = 1_000_000_000
    ranks = {h: rank_base for h in nodes}
    for _ in range(10):
        contrib = {}
        for s, d in edge_rows:
            contrib[d] = contrib.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {h: rank_base * 15 // 100 + (85 * contrib.get(h, 0)) // 100
                 for h in nodes}
    rank_rows = sorted(ranks.items())

    # ---- expected parquet (int32 to match the Scala Int columns) -----------
    rec_schema = pa.schema([
        ('name', pa.string()), ('rec_idx', pa.int32()), ('warc_type', pa.string()),
        ('uri', pa.string()), ('status', pa.int32()), ('content_type', pa.string()),
        ('body_len', pa.int32()), ('body_sha', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(rec_schema.names, r)) for r in rec_rows], schema=rec_schema),
        EXP_RECORDS)

    ext_schema = pa.schema([
        ('name', pa.string()), ('uri', pa.string()), ('offset', pa.int32()),
        ('kind', pa.string()), ('text', pa.string()), ('media_ref', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(ext_schema.names, r)) for r in ext_rows], schema=ext_schema),
        EXP_EXTRACT)

    links_schema = pa.schema([
        ('name', pa.string()), ('uri', pa.string()), ('link_idx', pa.int32()),
        ('href', pa.string()), ('anchor', pa.string()), ('rel', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(links_schema.names, r)) for r in link_rows], schema=links_schema),
        EXP_LINKS)

    frontier_schema = pa.schema([
        ('url', pa.string()), ('host', pa.string()), ('n_refs', pa.int64())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(frontier_schema.names, r)) for r in frontier_rows],
        schema=frontier_schema), EXP_FRONTIER)

    robots_schema = pa.schema([
        ('url', pa.string()), ('host', pa.string()), ('n_refs', pa.int64()),
        ('allowed', pa.bool_())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(robots_schema.names, r)) for r in robots_rows],
        schema=robots_schema), EXP_ROBOTS)

    sm_schema = pa.schema([
        ('url', pa.string()), ('host', pa.string()),
        ('lastmod', pa.string()), ('sitemap_url', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(sm_schema.names, r)) for r in sitemap_rows()],
        schema=sm_schema), EXP_SITEMAP)

    redir_schema = pa.schema([
        ('from_url', pa.string()), ('to_url', pa.string()),
        ('status', pa.int32())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(redir_schema.names, r)) for r in redirect_rows],
        schema=redir_schema), EXP_REDIRECTS)

    chain_schema = pa.schema([
        ('url', pa.string()), ('final_url', pa.string()),
        ('hops', pa.int32()), ('unresolved', pa.bool_())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(chain_schema.names, r)) for r in chain_rows],
        schema=chain_schema), EXP_CHAINS)

    edges_schema = pa.schema([('src', pa.string()), ('dst', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(edges_schema.names, r)) for r in edge_rows],
        schema=edges_schema), EXP_EDGES)

    cdx_schema = pa.schema([
        ('surt', pa.string()), ('ts', pa.string()), ('url', pa.string()),
        ('mime', pa.string()), ('status', pa.int32()),
        ('digest', pa.string()), ('rec_offset', pa.int64()),
        ('rec_length', pa.int64()), ('filename', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(cdx_schema.names, r)) for r in cdx_rows],
        schema=cdx_schema), EXP_CDX)

    anchor_schema = pa.schema([
        ('url', pa.string()), ('page', pa.string()),
        ('src_host', pa.string()), ('anchor', pa.string())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(anchor_schema.names, r)) for r in anchor_rows],
        schema=anchor_schema), EXP_ANCHOR)

    rank_schema = pa.schema([('host', pa.string()), ('rank', pa.int64())])
    pq.write_table(pa.Table.from_pylist(
        [dict(zip(rank_schema.names, r)) for r in rank_rows],
        schema=rank_schema), EXP_RANK)

    print(f'wrote {len(rec_rows)} record rows, {len(ext_rows)} extract rows, '
          f'{len(link_rows)} link rows, {len(frontier_rows)} frontier rows, '
          f'{len(anchor_rows)} anchor rows, '
          f'{sum(1 for r in robots_rows if not r[3])} robots-blocked, '
          f'{len(edge_rows)} host edges / {len(nodes)} hosts ranked')


if __name__ == '__main__':
    main()
