"""Outline migrator — placeholder; implemented later this round."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from xmltoldmigration_spark.kg.common import Ctx


def migrate(root: ET.Element, ctx: Ctx):
    raise NotImplementedError("outline migrator not yet implemented")
