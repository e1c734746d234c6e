#!/usr/bin/env python3
"""Extract the categorization rule tables from the reference implementation
(/root/reference/panda.py) into Scala data.

The rule semantics we need behavior-parity with: an ORDERED list of
(category, attribute, pattern[, account-scope]) substring rules where the
LAST matching rule wins (the reference applies them as sequential full-column
overwrites). This script AST-parses the two dict literals — it does not run
or copy reference code — and emits the flat ordered rule list as Scala.

Dev-only tool; output is committed as
src/main/scala/graft/finance/CategoryRuleTable.scala.
"""
import ast, sys
from pathlib import Path

SRC = Path("/root/reference/panda.py")


def find_dict(tree, name):
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == name:
                    return node.value
        if isinstance(node, ast.AnnAssign):
            if isinstance(node.target, ast.Name) and node.target.id == name:
                return node.value
    raise SystemExit(f"dict {name} not found")


def rules_from_dict(d):
    out = []  # (category, attribute, pattern, account_or_None) in textual order
    for k, v in zip(d.keys, d.values):
        category = ast.literal_eval(k)
        for attr_k, attr_v in zip(v.keys, v.values):
            attribute = ast.literal_eval(attr_k)
            for item in attr_v.elts:
                val = ast.literal_eval(item)
                if isinstance(val, tuple):
                    account, pattern = val
                    out.append((category, attribute, pattern, account))
                else:
                    out.append((category, attribute, val, None))
    return out


def esc(s):
    return s.replace("\\", "\\\\").replace('"', '\\"')


def scala_rule(cat, attr, pattern, account):
    acct = f'Some("{esc(account)}")' if account else "None"
    return f'    SubstringRule("{esc(cat)}", "{esc(attr)}", "{esc(pattern)}", {acct}),'


def main():
    tree = ast.parse(SRC.read_text())
    cat_rules = rules_from_dict(find_dict(tree, "category_attribute_subs_map"))
    xfer_rules = rules_from_dict(find_dict(tree, "transfer_category_attribute_subs_map"))
    attrs = {a for _, a, _, _ in cat_rules} | {a for _, a, _, _ in xfer_rules}
    assert attrs <= {"party", "purpose", "book_text"}, attrs

    lines = []
    lines.append("package graft.finance")
    lines.append("")
    lines.append("/** The categorization rule tables, as data.")
    lines.append("  *")
    lines.append("  * Extracted from the reference's two rule dicts")
    lines.append("  * (/root/reference/panda.py:87-465 `category_attribute_subs_map`,")
    lines.append("  * panda.py:531-537 `transfer_category_attribute_subs_map`) by")
    lines.append("  * tools/extract_rules.py. Order matters: the reference applies rules")
    lines.append("  * as sequential overwrites, so the LAST matching rule in this list")
    lines.append("  * wins. Do not sort or dedupe.")
    lines.append("  */")
    lines.append("object CategoryRuleTable {")
    lines.append(f"  /** {len(cat_rules)} ordered category rules. */")
    lines.append("  val categoryRules: Seq[SubstringRule] = Seq(")
    for r in cat_rules:
        lines.append(scala_rule(*r))
    lines.append("  )")
    lines.append("")
    lines.append(f"  /** {len(xfer_rules)} ordered transfer-category rules. */")
    lines.append("  val transferRules: Seq[SubstringRule] = Seq(")
    for r in xfer_rules:
        lines.append(scala_rule(*r))
    lines.append("  )")
    lines.append("}")
    Path("src/main/scala/graft/finance/CategoryRuleTable.scala").write_text(
        "\n".join(lines) + "\n")
    print(f"categoryRules: {len(cat_rules)}, transferRules: {len(xfer_rules)}")


if __name__ == "__main__":
    main()
