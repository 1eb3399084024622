from . import ooxml_extract  # noqa: F401 — registers shipped formats (docx_xml / pptx_xml)
