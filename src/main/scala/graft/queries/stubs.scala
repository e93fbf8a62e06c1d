package graft.queries

// Placeholder modules — filled in as each layer lands (SURVEY.md §7 order).
object ExtDedup extends QueryModule { def defs: Seq[QueryDef] = Seq.empty }
object ExtSimilarity extends QueryModule { def defs: Seq[QueryDef] = Seq.empty }
object ExtText extends QueryModule { def defs: Seq[QueryDef] = Seq.empty }
object ExtMultimodal extends QueryModule { def defs: Seq[QueryDef] = Seq.empty }
object ExtEvents extends QueryModule { def defs: Seq[QueryDef] = Seq.empty }
