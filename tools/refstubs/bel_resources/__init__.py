"""Offline stand-in for the public bel-resources package (import support for
golden-fixture generation against the read-only reference).

Only the pieces the reference imports are provided; resource URLs resolve
against a local path registry instead of HTTP.
"""

import configparser
import io


class ResourceError(Exception):
    def __init__(self, location):
        super().__init__(location)
        self.location = location


#: url -> local file path, populated by the golden harness
LOCAL_RESOURCES = {}


def _sanitized(lines):
    cleaned = []
    for number, line in enumerate(lines, start=1):
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        cleaned.append((number, line))
    out = []
    i = 0
    while i < len(cleaned):
        number, line = cleaned[i]
        while line.endswith('\\') and i + 1 < len(cleaned):
            i += 1
            line = line.rstrip('\\').strip() + ' ' + cleaned[i][1]
        out.append((number, line))
        i += 1
    return out


def split_file_to_annotations_and_definitions(file):
    import re
    metadata_re = re.compile(r"(SET\s+DOCUMENT|DEFINE\s+NAMESPACE|DEFINE\s+ANNOTATION)")
    content = _sanitized(file)
    end_document = 0
    end_definitions = 0
    for idx, (_, line) in enumerate(content):
        if line.startswith('SET DOCUMENT'):
            end_document = idx + 1
        if metadata_re.match(line):
            end_definitions = idx + 1
    end_definitions = max(end_definitions, end_document)
    return content[:end_document], content[end_document:end_definitions], content[end_definitions:]


def get_bel_resource(url):
    try:
        path = LOCAL_RESOURCES[url]
    except KeyError:
        raise ResourceError(url)
    with open(path) as f:
        text = f.read()
    config = configparser.ConfigParser(delimiters=('=',), strict=False, interpolation=None)
    config.optionxform = str
    # [Values] section is 'name|encoding' lines, not key=value; split manually
    sections = {}
    current = None
    values = {}
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped:
            continue
        if stripped.startswith('['):
            current = stripped.strip('[]')
            sections.setdefault(current, {})
            continue
        if current == 'Values':
            name, _, encoding = stripped.rpartition('|')
            if not name:
                name, encoding = stripped, ''
            values[name] = encoding
        elif current is not None and '=' in stripped:
            k, _, v = stripped.partition('=')
            sections[current][k.strip()] = v.strip()
    result = dict(sections)
    result['Values'] = values
    return result


def make_knowledge_header(*args, **kwargs):
    return []


def write_namespace(*args, **kwargs):
    raise NotImplementedError


def parse_bel_resource(file):
    return get_bel_resource_from_text(file.read())
