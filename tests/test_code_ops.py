"""Code-corpus curation (operators/code.py): license detection and
programming-language identification."""

import pytest

import feature_factory_spark as ff

MIT = (
    "Copyright (c) 2020 Someone\n\nPermission is hereby granted, free "
    "of charge, to any person obtaining a copy of this software..."
)
APACHE = (
    "Licensed under the Apache License, Version 2.0 (the \"License\");\n"
    "you may not use this file except in compliance with the License."
)
GPL3 = (
    "This program is free software: you can redistribute it under the "
    "terms of the GNU General Public License as published by the Free "
    "Software Foundation, either version 3 of the License..."
)
GPL2 = (
    "under the terms of the GNU General Public License as published by "
    "the Free Software Foundation; either version 2 of the License"
)
LGPL = "under the terms of the GNU Lesser General Public License v2.1"
AGPL = "under the terms of the GNU Affero General Public License"
BSD3 = (
    "Redistribution and use in source and binary forms, with or without "
    "modification, are permitted provided that the following conditions "
    "are met:... Neither the name of the copyright holder nor the names "
    "of its contributors may be used..."
)
BSD2 = (
    "Redistribution and use in source and binary forms, with or without "
    "modification, are permitted provided that the following conditions "
    "are met: 1. Redistributions of source code must retain the above."
)
UNLICENSE = "This is free and unencumbered software released into the public domain."
ISC = (
    "Permission to use, copy, modify, and/or distribute this software "
    "for any purpose with or without fee is hereby granted."
)


@pytest.mark.parametrize("text,expect", [
    (MIT, "MIT"), (APACHE, "Apache-2.0"), (GPL3, "GPL-3.0"),
    (GPL2, "GPL-2.0"), (LGPL, "LGPL-2.1"), (AGPL, "AGPL-3.0"),
    (BSD3, "BSD-3-Clause"), (BSD2, "BSD-2-Clause"),
    (UNLICENSE, "Unlicense"), (ISC, "ISC"),
    ("Mozilla Public License, v. 2.0", "MPL-2.0"),
    ("just some code\nprint('hi')\n", None),
])
def test_license_heuristics(spark, text, expect):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = ff.LicenseDetector("text").transform(df).collect()[0]
    assert r["text_license"] == expect
    assert r["text_license_source"] == ("heuristic" if expect else None)


def test_spdx_tag_takes_precedence(spark):
    # an MIT body with an explicit Apache SPDX tag resolves to the tag
    text = "# SPDX-License-Identifier: Apache-2.0\n" + MIT
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    r = ff.LicenseDetector("text").transform(df).collect()[0]
    assert r["text_license"] == "Apache-2.0"
    assert r["text_license_source"] == "spdx"


def test_license_null_and_clash(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    r = ff.LicenseDetector("text").transform(df).collect()[0]
    assert r["text_license"] is None and r["text_license_source"] is None
    clash = df.withColumnRenamed("text", "t").withColumnRenamed("doc_id", "t_license")
    with pytest.raises(Exception, match="already exist"):
        ff.LicenseDetector("t").transform(clash)


@pytest.mark.parametrize("path,text,expect", [
    ("src/main.py", None, "python"),
    ("a/b/Component.TSX", None, "typescript"),  # extension is cased-down
    ("lib.rs", None, "rust"),
    ("Makefile", None, None),
    ("run", "#!/usr/bin/env python3\nprint()", "python"),
    ("run", "#!/bin/sh -e\necho hi", "shell"),
    ("run", "#!/usr/bin/node\nconsole.log()", "javascript"),
    ("run", "no shebang here", None),
    ("weird.xyz", "#!/usr/bin/env ruby\n", "ruby"),  # ext unknown -> shebang
])
def test_code_language(spark, path, text, expect):
    df = spark.createDataFrame([(path, text)], "path string, text string")
    got = ff.CodeLanguageIdentifier("path", text_col="text").transform(df)
    assert got.collect()[0]["code_lang"] == expect


def test_code_language_path_only(spark):
    df = spark.createDataFrame(
        [("x.go",), ("y.java",), ("z.unknownext",), (None,)], "path string"
    )
    got = {r["path"]: r["code_lang"]
           for r in ff.CodeLanguageIdentifier("path").transform(df).collect()}
    assert got == {"x.go": "go", "y.java": "java",
                   "z.unknownext": None, None: None}


def test_plans_stay_narrow(spark):
    df = spark.createDataFrame(
        [(1, "text", "a.py")], "doc_id bigint, text string, path string"
    )
    out = ff.CodeLanguageIdentifier("path", text_col="text").transform(
        ff.LicenseDetector("text").transform(df)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
