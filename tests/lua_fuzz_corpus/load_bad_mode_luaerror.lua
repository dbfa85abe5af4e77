-- round 5: load() argument errors must be CATCHABLE LuaErrors, never
-- raw host exceptions ('"t" not in 3.0' leaked a Python TypeError that
-- escaped pcall and was misread by the bridge's fallback clauses as an
-- Unvectorizable verdict, demoting the whole lens to the scalar tier).
-- Also pins the (nil, message) protocol for a string mode without 't'.
local ok, err = pcall(load, "x = 1", "chunk", 3)
local f2, msg = load("y = 2", nil, "b")
function f(x, y)
  if ok or f2 ~= nil then return nil end
  if err == nil or msg == nil then return nil end
  return x + 1, y - 1
end
